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


def _np_lpips(params, pred, gt):
    """Independent pure-numpy LPIPS forward (einsum convs, no XLA): the
    numeric oracle standing in for the reference's PyTorch-parity pin
    (lpips/src/lib.rs:202-214, 0.657102±1e-4) until real VGG weights can
    ship. Same math; a completely separate implementation path."""
    shift = np.array([-0.030, -0.088, -0.188], np.float32)
    scale = np.array([0.458, 0.448, 0.450], np.float32)
    blocks = [(64, 2), (128, 2), (256, 3), (512, 3), (512, 3)]

    def conv3x3_same(x, w, b):
        # x: [H,W,Cin], w: [3,3,Cin,Cout]
        xp = np.pad(x, ((1, 1), (1, 1), (0, 0)))
        h, wd, _ = x.shape
        patches = np.stack(
            [xp[i:i + h, j:j + wd] for i in range(3) for j in range(3)], 0)
        out = np.einsum("phwc,pco->hwo", patches.astype(np.float64),
                        w.reshape(9, w.shape[2], w.shape[3]).astype(np.float64))
        return np.maximum(out + b.astype(np.float64), 0.0)

    def features(img):
        h = (img * 2.0 - 1.0 - shift) / scale
        h = h.astype(np.float64)
        taps = []
        for bi, (_, n) in enumerate(blocks):
            for i in range(n):
                p = params[f"conv_{bi}_{i}"]
                h = conv3x3_same(h, np.asarray(p["w"]), np.asarray(p["b"]))
            taps.append(h)
            if bi < len(blocks) - 1:
                hh, ww, c = h.shape
                h = h.reshape(hh // 2, 2, ww // 2, 2, c).max(axis=(1, 3))
        return taps

    total = 0.0
    for bi, (fp, fg) in enumerate(zip(features(pred), features(gt))):
        pn = fp / np.sqrt((fp * fp).sum(-1, keepdims=True) + 1e-10)
        gn = fg / np.sqrt((fg * fg).sum(-1, keepdims=True) + 1e-10)
        diff = (pn - gn) ** 2
        w = np.asarray(params[f"lin_{bi}"]["w"])[0, 0, :, 0]
        total += (diff * w).sum(-1).mean()
    return total


def test_numeric_parity_vs_numpy_oracle():
    """Numeric lock-down: the JAX implementation must reproduce an
    independent float64-numpy forward to 1e-5 on deterministic weights.
    Catches conv-precision regressions (the TPU bf16 class) and any math
    drift; weight-level PyTorch parity activates the day weights ship."""
    m = random_lpips(seed=7)
    rng = np.random.default_rng(3)
    a = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    b = rng.uniform(0, 1, (16, 16, 3)).astype(np.float32)
    want = _np_lpips(m.params, a, b)
    got = float(m(jnp.asarray(a)[None], jnp.asarray(b)[None]))
    assert want > 0.01  # non-degenerate fixture
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


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
