"""Data-parallel training over an 8-device virtual CPU mesh: splats
replicated, views sharded, gradients psum'd over the mesh.

The correctness bar (this is OUR parallelism axis; the reference has none,
SURVEY.md §2.5): a dp=8 sharded step must produce the SAME post-step
parameters as the identical batched step compiled for a single device —
if the psum/sharding were wrong (missing reduction, wrong mean factor,
per-shard rng divergence) these diverge immediately.
"""

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
from brush_tpu.train.refine import refine_step
from brush_tpu.train.splat_init import create_random_splats
from brush_tpu.train.trainer import (
    SceneBatch, init_train_state, train_step_impl)

IMG = (32, 32)
RCFG = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=1 << 11,
                    max_per_tile=256, chunk=32)


def _make_scene(n_views=8, n_splats=32):
    rng = np.random.default_rng(3)
    cams = [
        Camera(position=np.array([np.sin(t), 0.0, -4.0 + np.cos(t)]),
               rotation=np.array([1.0, 0.0, 0.0, 0.0]),
               fov_x=0.9, fov_y=0.9)
        for t in np.linspace(0, 0.5, n_views)
    ]
    splats = create_random_splats(n_splats, cams, rng,
                                  scene_scale_override=6.0, sh_degree=0)
    y, x = np.mgrid[0:IMG[1], 0:IMG[0]]
    batches = []
    for i, cam in enumerate(cams):
        gt = np.stack([x / 32, y / 32, np.full_like(x, i / n_views)],
                      -1).astype(np.float32)
        batches.append(SceneBatch(gt_packed=jnp.asarray(pack_gt(gt)),
                                  cam=camera_inputs(cam, IMG)))
    return splats, stack_batches(batches)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_step_matches_single_device():
    """dp=8 post-step state == single-device batched post-step state."""
    tcfg = TrainConfig(total_train_iters=100)
    splats, batch = _make_scene()

    state0 = init_train_state(splats, jax.random.PRNGKey(0), median_scale=3.0)

    # Single-device reference: same batched step, no mesh/shardings.
    single = jax.jit(lambda s, b: train_step_impl(s, b, tcfg, RCFG,
                                                  batched=True))
    ref_state, ref_stats, _ = single(state0, batch)

    mesh = view_mesh()
    assert mesh.shape["dp"] == 8
    step = make_dp_train_step(mesh, tcfg, RCFG, donate=False)
    dp_state, dp_stats, _ = step(state0, batch)

    assert np.isfinite(float(dp_stats.loss))
    np.testing.assert_allclose(float(dp_stats.loss), float(ref_stats.loss),
                               rtol=1e-5)
    # Params moved, and dp == single-device everywhere (params, moments,
    # refine stats). Cross-chip reduction order may differ from the local
    # sum's, so exact bitwise equality isn't guaranteed — 1e-5 is far below
    # any systematic error (a missing psum or wrong 1/B factor is O(1)).
    assert float(jnp.abs(ref_state.splats.means - state0.splats.means).max()) > 0
    for ref_leaf, dp_leaf in zip(
            jax.tree_util.tree_leaves((ref_state.splats.params(),
                                       ref_state.opt, ref_state.refine)),
            jax.tree_util.tree_leaves((dp_state.splats.params(),
                                       dp_state.opt, dp_state.refine))):
        np.testing.assert_allclose(np.asarray(dp_leaf), np.asarray(ref_leaf),
                                   rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_multi_step_with_refine():
    """Multi-step dp ≡ single-device (exact run, no refine), then a refine
    inside the dp loop keeps training sane. Refine is NOT compared across
    paths: its discrete decisions (Gumbel top-k, prune thresholds) can flip
    on reduction-order noise, which is expected — the equality bar applies
    to the differentiable step."""
    tcfg = TrainConfig(total_train_iters=100, refine_every=2)
    splats, batch = _make_scene()
    state = init_train_state(splats, jax.random.PRNGKey(0), median_scale=3.0)
    ref_state = state

    mesh = view_mesh()
    step = make_dp_train_step(mesh, tcfg, RCFG, donate=False)
    single = jax.jit(lambda s, b: train_step_impl(s, b, tcfg, RCFG,
                                                  batched=True))

    for _ in range(4):
        state, stats, _ = step(state, batch)
        ref_state, ref_stats, _ = single(ref_state, batch)
        assert np.isfinite(float(stats.loss))

    np.testing.assert_allclose(float(stats.loss), float(ref_stats.loss),
                               rtol=1e-3)
    # Multi-step tolerance is loose on purpose: Adam (eps=1e-15) renormalizes
    # tiny gradients, so one step's reduction-order noise (~1e-7) amplifies
    # ~10x per step. A systematic sharding bug (missing psum, wrong 1/B) is
    # O(1) and still fails this; exactness is pinned by the 1-step test.
    for ref_leaf, dp_leaf in zip(
            jax.tree_util.tree_leaves(ref_state.splats.params()),
            jax.tree_util.tree_leaves(state.splats.params())):
        np.testing.assert_allclose(np.asarray(dp_leaf), np.asarray(ref_leaf),
                                   rtol=2e-2, atol=1e-2)

    # Refine on the dp-trained state, then keep dp-training: state stays
    # finite, alive set non-empty, and the next dp step still runs.
    centers = jnp.zeros((8, 3), jnp.float32)
    focals = jnp.full((8,), 30.0, jnp.float32)
    refine = jax.jit(lambda s: refine_step(s, tcfg, centers, focals))
    state, _ = refine(state)
    assert int(state.splats.n_alive) > 0
    state, stats, _ = step(state, batch)
    assert np.isfinite(float(stats.loss))
    for leaf in jax.tree_util.tree_leaves(state.splats.params()):
        assert np.isfinite(np.asarray(leaf)).all()
