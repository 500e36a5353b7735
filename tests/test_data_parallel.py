"""Data-parallel training over an 8-device virtual CPU mesh: splats
replicated, views sharded, gradients psum'd over the mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.ops.loss import pack_gt
from brush_tpu.parallel.data_parallel import (
    make_dp_train_step, stack_batches, view_mesh)
from brush_tpu.render import RenderConfig, camera_inputs
from brush_tpu.train.config import TrainConfig
from brush_tpu.train.splat_init import create_random_splats
from brush_tpu.train.trainer import SceneBatch, init_train_state

IMG = (32, 32)
RCFG = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=1 << 11,
                    max_per_tile=256, chunk=32)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_train_step_runs_and_matches_grads():
    rng = np.random.default_rng(3)
    cams = [
        Camera(position=np.array([np.sin(t), 0.0, -4.0 + np.cos(t)]),
               rotation=np.array([1.0, 0.0, 0.0, 0.0]),
               fov_x=0.9, fov_y=0.9)
        for t in np.linspace(0, 0.5, 8)
    ]
    splats = create_random_splats(32, cams, rng, scene_scale_override=6.0,
                                  sh_degree=0)
    y, x = np.mgrid[0:IMG[1], 0:IMG[0]]
    batches = []
    for i, cam in enumerate(cams):
        gt = np.stack([x / 32, y / 32, np.full_like(x, i / 8.0)], -1).astype(np.float32)
        batches.append(SceneBatch(gt_packed=jnp.asarray(pack_gt(gt)),
                                  cam=camera_inputs(cam, IMG)))
    batch = stack_batches(batches)

    mesh = view_mesh()
    tcfg = TrainConfig(total_train_iters=100)
    state = init_train_state(splats, jax.random.PRNGKey(0), median_scale=3.0)
    step = make_dp_train_step(mesh, tcfg, RCFG, donate=False)

    state2, stats, aux = step(state, batch)
    assert np.isfinite(float(stats.loss))
    for leaf in jax.tree_util.tree_leaves(state2.splats.params()):
        assert np.isfinite(np.asarray(leaf)).all()
    # Params actually moved.
    assert float(jnp.abs(state2.splats.means - state.splats.means).max()) > 0
