"""Loss structural properties, modeled on brush-loss/tests/reference.rs:
SSIM(x,x) ~ 1, range, finite grads on deterministic patterns."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.ops.loss import (
    ImageLossConfig, image_loss, image_loss_map, pack_gt, psnr, ssim, unpack_gt,
)


def checker(h, w):
    y, x = np.mgrid[0:h, 0:w]
    img = ((x // 8 + y // 8) % 2).astype(np.float32)
    return np.stack([img, 1 - img, 0.5 * img], axis=-1)


def test_pack_unpack_roundtrip():
    rgb = np.random.default_rng(0).uniform(0, 1, (33, 47, 3)).astype(np.float32)
    a = np.random.default_rng(1).uniform(0, 1, (33, 47)).astype(np.float32)
    packed = pack_gt(rgb, a)
    rgb2, a2 = unpack_gt(jnp.asarray(packed))
    assert np.abs(np.asarray(rgb2) - np.clip(np.rint(rgb * 255), 0, 255) / 255).max() < 1e-6
    assert np.abs(np.asarray(a2) - np.clip(np.rint(a * 255), 0, 255) / 255).max() < 1e-6


def test_ssim_self_is_one():
    img = checker(64, 64)
    packed = pack_gt(img)
    # gt decode is 8-bit quantized, so compare against the quantized image.
    q = np.rint(img * 255) / 255.0
    s = float(ssim(jnp.asarray(q, jnp.float32), jnp.asarray(packed)))
    assert abs(s - 1.0) < 1e-4


def test_ssim_range_and_l1():
    a = checker(64, 64)
    b = 1.0 - a
    packed_b = pack_gt(b)
    cfg = ImageLossConfig(l1_weight=1.0, ssim_weight=0.0)
    lmap = image_loss_map(jnp.asarray(a, jnp.float32), jnp.asarray(packed_b), cfg)
    assert np.all(np.asarray(lmap) >= 0)
    s = float(ssim(jnp.asarray(a, jnp.float32), jnp.asarray(packed_b)))
    assert -1.0 <= s < 0.5  # opposite images: low/negative ssim


def test_loss_grads_finite():
    gt = pack_gt(checker(48, 48))
    pred = jnp.asarray(checker(48, 48) * 0.7 + 0.1, jnp.float32)
    cfg = ImageLossConfig(l1_weight=0.8, ssim_weight=-0.2)

    g = jax.grad(lambda p: image_loss(p, jnp.asarray(gt), cfg))(pred)
    arr = np.asarray(g)
    assert np.isfinite(arr).all()
    assert np.abs(arr).max() > 0


def test_psnr_identity_is_high():
    img = checker(32, 32)
    q = np.rint(img * 255) / 255.0
    p = float(psnr(jnp.asarray(q, jnp.float32), jnp.asarray(pack_gt(img))))
    assert p > 60.0


def test_masked_loss_zeros_masked_pixels():
    rgb = checker(32, 32)
    alpha = np.zeros((32, 32), np.float32)
    alpha[:16] = 1.0
    packed = pack_gt(rgb, alpha)
    cfg = ImageLossConfig(l1_weight=1.0, ssim_weight=0.0, mask=True)
    lmap = np.asarray(image_loss_map(jnp.zeros((32, 32, 3)), jnp.asarray(packed), cfg))
    assert np.all(lmap[16:] == 0.0)
    assert lmap[:16].max() > 0.1
