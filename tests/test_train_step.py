"""End-to-end training smoke test: seeded synthetic splats + synthetic camera
batches through full train_step cycles (mirrors the reference's
brush-bench-test/tests/integration.rs)."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.ops.loss import pack_gt
from brush_tpu.render import RenderConfig, camera_inputs, render
from brush_tpu.train.config import TrainConfig
from brush_tpu.train.splat_init import create_random_splats
from brush_tpu.train.trainer import SceneBatch, init_train_state, train_step

IMG = (64, 64)
RCFG = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=1 << 13,
                    max_per_tile=512, chunk=32)


def make_setup():
    rng = np.random.default_rng(7)
    cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9)
    splats = create_random_splats(64, [cam], rng, scene_scale_override=6.0,
                                  sh_degree=0)
    # Ground truth: a diagonal gradient image.
    y, x = np.mgrid[0:IMG[1], 0:IMG[0]]
    gt = np.stack([x / 64, y / 64, 0.5 * np.ones_like(x)], -1).astype(np.float32)
    batch = SceneBatch(gt_packed=jnp.asarray(pack_gt(gt)),
                       cam=camera_inputs(cam, IMG))
    return splats, batch, cam


def test_train_step_reduces_loss():
    splats, batch, cam = make_setup()
    tcfg = TrainConfig(total_train_iters=100)
    state = init_train_state(splats, jax.random.PRNGKey(0), median_scale=3.0)

    step = jax.jit(lambda s, b: train_step(s, b, tcfg, RCFG))
    losses = []
    for _ in range(12):
        state, stats, aux = step(state, batch)
        losses.append(float(stats.loss))
    assert np.isfinite(losses).all()
    # Averaged over the last few steps the loss should clearly decrease
    # (individual steps are noisy due to the random background).
    assert np.mean(losses[-4:]) < np.mean(losses[:4]) - 1e-3

    # Parameters must remain finite and the step counter must advance.
    for leaf in jax.tree_util.tree_leaves(state.splats.params()):
        assert np.isfinite(np.asarray(leaf)).all()
    assert int(state.step) == 12
    # Refine stats accumulated.
    assert float(jnp.max(state.refine.visible_count)) > 0
    assert float(jnp.max(state.refine.refine_weight)) > 0


def test_train_step_overflow_is_noop():
    """A step whose intersections overflow the capacity must not touch
    params/moments/refine (device-side no-op gate) — truncated gradients are
    never applied. The reference instead re-sizes buffers exactly every step
    (render.rs:146-167); we detect-and-skip."""
    splats, batch, _ = make_setup()
    # Blow up the splat scales so every splat covers many tiles: with
    # expand_k0=1 nearly every bbox slot rides the remainder path, which a
    # tiny isect_cap then overflows.
    splats = splats.replace(log_scales=jnp.full_like(splats.log_scales, 0.3))
    tcfg = TrainConfig(total_train_iters=100)
    state = init_train_state(splats, jax.random.PRNGKey(2), median_scale=3.0)

    rcfg_tiny = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=32,
                             expand_k0=1, max_per_tile=512, chunk=32)
    step = jax.jit(lambda s, b: train_step(s, b, tcfg, rcfg_tiny))
    state2, stats, aux = step(state, batch)

    assert int(aux.num_isects) > 32, "setup failed to overflow"
    assert bool(stats.overflowed)
    np.testing.assert_array_equal(np.asarray(state2.splats.means),
                                  np.asarray(state.splats.means))
    np.testing.assert_array_equal(
        np.asarray(state2.opt["means"].moment1),
        np.asarray(state.opt["means"].moment1))
    np.testing.assert_array_equal(np.asarray(state2.refine.visible_count),
                                  np.asarray(state.refine.visible_count))
    # step/rng still advance so the run keeps moving.
    assert int(state2.step) == 1

    # Same scene with ample capacity: not flagged, params move.
    rcfg_big = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=1 << 13,
                            max_per_tile=512, chunk=32)
    step2 = jax.jit(lambda s, b: train_step(s, b, tcfg, rcfg_big))
    state3, stats3, _ = step2(state, batch)
    assert not bool(stats3.overflowed)
    assert np.any(np.asarray(state3.splats.means)
                  != np.asarray(state.splats.means))


def test_train_step_donation_compatible():
    """The step must be jittable with donated state (in-place splat buffers)."""
    splats, batch, _ = make_setup()
    tcfg = TrainConfig(total_train_iters=100)
    state = init_train_state(splats, jax.random.PRNGKey(1), median_scale=3.0)
    step = jax.jit(lambda s, b: train_step(s, b, tcfg, RCFG), donate_argnums=0)
    state2, stats, _ = step(state, batch)
    assert np.isfinite(float(stats.loss))
