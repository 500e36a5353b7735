"""LPIPS architecture invariants (weights not shipped — no egress; the
reference's exact-value test needs the converted VGG weights file).
Mirrors lpips/src/lib.rs:159-215's identity/symmetry checks."""

import jax.numpy as jnp
import numpy as np

from brush_tpu.models.lpips import random_lpips


def imgs():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    return a, b


def test_identity_is_zero():
    m = random_lpips()
    a, _ = imgs()
    assert abs(float(m(a, a))) < 1e-6


def test_symmetry_and_positive():
    m = random_lpips()
    a, b = imgs()
    d_ab = float(m(a, b))
    d_ba = float(m(b, a))
    assert d_ab > 0
    assert abs(d_ab - d_ba) < 1e-6


def test_feature_tap_shapes():
    m = random_lpips()
    a, _ = imgs()
    taps = m.features(a)
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512, 512]
    assert [t.shape[1] for t in taps] == [64, 32, 16, 8, 4]


def test_lpips_term_in_train_step():
    """Optional perceptual loss term wires into the jitted step
    (train.rs:246-253; weight 0 by default)."""
    import jax
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.ops.loss import pack_gt
    from brush_tpu.render import RenderConfig, camera_inputs
    from brush_tpu.train.config import TrainConfig
    from brush_tpu.train.splat_init import create_random_splats
    from brush_tpu.train.trainer import (
        SceneBatch, init_train_state, train_step)

    rng = np.random.default_rng(0)
    cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9)
    splats = create_random_splats(32, [cam], rng, scene_scale_override=6.0,
                                  sh_degree=0)
    img = (64, 64)  # LPIPS needs >= 5 downsamplings of headroom
    gt = pack_gt(rng.uniform(0, 1, (64, 64, 3)).astype(np.float32))
    rcfg = RenderConfig(img_size=img, sh_degree=0, isect_cap=1 << 11,
                        max_per_tile=128)
    batch = SceneBatch(gt_packed=jnp.asarray(gt), cam=camera_inputs(cam, img))
    m = random_lpips()

    losses = {}
    for w, model in [(0.0, None), (0.5, m)]:
        tcfg = TrainConfig(total_train_iters=10, lpips_loss_weight=w)
        state = init_train_state(splats, jax.random.PRNGKey(0), 3.0)
        step = jax.jit(lambda s, b, t=tcfg, mm=model: train_step(
            s, b, t, rcfg, lpips_model=mm))
        state, stats, _ = step(state, batch)
        losses[w] = float(stats.loss)
    assert np.isfinite(losses[0.5])
    assert losses[0.5] != losses[0.0]  # the term contributes
