"""Masked and alpha-match training paths (brush-loss alpha handling +
trainer comptime flags)."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.ops.loss import pack_gt
from brush_tpu.render import RenderConfig, camera_inputs
from brush_tpu.train.config import TrainConfig
from brush_tpu.train.splat_init import create_random_splats
from brush_tpu.train.trainer import SceneBatch, init_train_state, train_step

IMG = (32, 32)
RCFG = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=1 << 11,
                    max_per_tile=128)


def setup(seed=0):
    rng = np.random.default_rng(seed)
    cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9)
    splats = create_random_splats(48, [cam], rng, scene_scale_override=6.0,
                                  sh_degree=0)
    y, x = np.mgrid[0:32, 0:32]
    rgb = np.stack([x / 32, y / 32, 0.5 * np.ones_like(x)], -1).astype(np.float32)
    alpha = (x > 16).astype(np.float32)
    return splats, cam, rgb, alpha


def run(splats, cam, gt_packed, has_alpha, alpha_is_mask, tcfg):
    batch = SceneBatch(gt_packed=jnp.asarray(gt_packed),
                       cam=camera_inputs(cam, IMG))
    state = init_train_state(splats, jax.random.PRNGKey(0), 3.0)
    step = jax.jit(lambda s, b: train_step(s, b, tcfg, RCFG,
                                           has_alpha=has_alpha,
                                           alpha_is_mask=alpha_is_mask))
    for _ in range(3):
        state, stats, _ = step(state, batch)
    return state, float(stats.loss)


def test_alpha_match_path_runs():
    splats, cam, rgb, alpha = setup()
    gt = pack_gt(rgb, alpha)
    tcfg = TrainConfig(total_train_iters=10, match_alpha_weight=0.1)
    state, loss = run(splats, cam, gt, has_alpha=True, alpha_is_mask=False,
                      tcfg=tcfg)
    assert np.isfinite(loss)
    for leaf in jax.tree_util.tree_leaves(state.splats.params()):
        assert np.isfinite(np.asarray(leaf)).all()


def test_masked_path_runs_and_masks():
    splats, cam, rgb, alpha = setup()
    gt = pack_gt(rgb, alpha)
    tcfg = TrainConfig(total_train_iters=10)
    state, loss = run(splats, cam, gt, has_alpha=True, alpha_is_mask=True,
                      tcfg=tcfg)
    assert np.isfinite(loss)


def test_opaque_path_matches_none_alpha():
    """Opaque alpha (=1) with compositing is a no-op vs the no-alpha path,
    up to the alpha-match term (disabled here)."""
    splats, cam, rgb, _ = setup()
    gt = pack_gt(rgb)  # alpha = 255 everywhere
    tcfg = TrainConfig(total_train_iters=10, match_alpha_weight=0.0)
    _, loss_a = run(splats, cam, gt, has_alpha=True, alpha_is_mask=False,
                    tcfg=tcfg)
    _, loss_b = run(splats, cam, gt, has_alpha=False, alpha_is_mask=False,
                    tcfg=tcfg)
    assert abs(loss_a - loss_b) < 1e-5
