"""Fused L1 + SSIM image loss.

XLA-native port of the reference's fused loss kernel
(brush-loss/src/lib.rs: forward :181-363, config :700-713, API :1075-1140):
per-pixel `l1_w * |pred - gt_eff| + ssim_w * ssim(pred, gt_eff)` where
`gt_eff = gt + (1 - gt.a) * bg` when compositing, `* gt.a` when masking, and
channel 3 (when pred is RGBA) carries `|pred.a - gt.a|` for alpha-match
training.

Numerical contract (lib.rs:55-68, 334-346): 11-tap sigma=1.5 normalized
Gaussian window, zero-padded at image borders (reads return 0 out-of-bounds),
variances floored at 0, SSIM clamped to [-1, 1], C1 = 0.01^2, C2 = 0.03^2.

TPU design (SURVEY.md Appendix C): the two separable blur passes are plain
depthwise convolutions — XLA fuses the elementwise moment math into them, and
the whole map is wrapped in `jax.checkpoint` so the backward recomputes the
blurred moments instead of saving five moment maps, matching the reference
backward's no-saved-state property (lib.rs:371+). Only drop to Pallas if the
profiler ever shows this on the critical path.

GT stays packed as u32 RGBA (scene.rs:117-129: ~4x less pixel-side memory);
decode happens inside the (fused) computation.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.constants import SSIM_C1, SSIM_C2, SSIM_SIGMA, SSIM_WINDOW


def _gauss_taps() -> np.ndarray:
    x = np.arange(SSIM_WINDOW, dtype=np.float32) - (SSIM_WINDOW // 2)
    w = np.exp(-x * x / (2.0 * SSIM_SIGMA * SSIM_SIGMA))
    return (w / w.sum()).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class ImageLossConfig:
    l1_weight: float = 0.8
    ssim_weight: float = -0.2      # negative: maximizing SSIM (train.rs:209-212)
    composite_bg: tuple | None = None  # fold gt + (1-a)*bg when set
    mask: bool = False             # multiply loss map by gt.a
    alpha_match: bool = False      # pred is RGBA; emit |pred.a-gt.a| channel


def unpack_gt(gt_packed: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[H, W] uint32 RGBA -> ([H, W, 3] rgb, [H, W] alpha), all in [0, 1]."""
    g = gt_packed.astype(jnp.uint32)
    rgb = jnp.stack(
        [(g >> (8 * c)) & 0xFF for c in range(3)], axis=-1).astype(jnp.float32)
    a = ((g >> 24) & 0xFF).astype(jnp.float32)
    return rgb / 255.0, a / 255.0


def unpack_gt_rgb(gt_packed: jnp.ndarray, composite_bg=None) -> jnp.ndarray:
    """f32 RGB ground truth (lib.rs unpack_gt_rgb:1126) — LPIPS path only."""
    rgb, a = unpack_gt(gt_packed)
    if composite_bg is not None:
        rgb = rgb + (1.0 - a[..., None]) * jnp.asarray(composite_bg, jnp.float32)
    return rgb


def pack_gt(rgb: np.ndarray, alpha: np.ndarray | None = None) -> np.ndarray:
    """Host-side: [H, W, 3] + optional [H, W] alpha in [0,1] -> [H, W] uint32."""
    q = np.clip(np.rint(rgb * 255.0), 0, 255).astype(np.uint32)
    a = (np.full(rgb.shape[:2], 255, np.uint32) if alpha is None
         else np.clip(np.rint(alpha * 255.0), 0, 255).astype(np.uint32))
    return q[..., 0] | (q[..., 1] << 8) | (q[..., 2] << 16) | (a << 24)


def _blur11(x: jnp.ndarray) -> jnp.ndarray:
    """Separable zero-padded 11-tap Gaussian over [C, H, W]."""
    taps = jnp.asarray(_gauss_taps())
    c = x.shape[0]
    kh = jnp.broadcast_to(taps.reshape(1, 1, SSIM_WINDOW, 1), (c, 1, SSIM_WINDOW, 1))
    kw = jnp.broadcast_to(taps.reshape(1, 1, 1, SSIM_WINDOW), (c, 1, 1, SSIM_WINDOW))
    pad = SSIM_WINDOW // 2
    # HIGHEST precision: TPU convs otherwise run bf16 on the MXU, which
    # wrecks the x^2/xy moment differences (SSIM of identical images
    # measured 0.55 instead of ~1.0 on v5e).
    y = jax.lax.conv_general_dilated(
        x[None], kh, (1, 1), [(pad, pad), (0, 0)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    y = jax.lax.conv_general_dilated(
        y, kw, (1, 1), [(0, 0), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"), feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)
    return y[0]


@functools.partial(jax.checkpoint, static_argnums=(2,))
def _loss_map(pred: jnp.ndarray, gt_packed: jnp.ndarray,
              cfg: ImageLossConfig, bg_dyn=None) -> jnp.ndarray:
    # Composite bg comes either from the static config or as a TRACED value
    # (`bg_dyn`, the trainer's per-step noised background) — one
    # implementation for both, so the numerically delicate SSIM pipeline
    # exists exactly once.
    gt_rgb, gt_a = unpack_gt(gt_packed)
    bg = (jnp.asarray(cfg.composite_bg, jnp.float32)
          if cfg.composite_bg is not None else bg_dyn)
    if bg is not None:
        gt_rgb = gt_rgb + (1.0 - gt_a[..., None]) * bg

    p = jnp.moveaxis(pred[..., :3], -1, 0)   # [3, H, W]
    g = jnp.moveaxis(gt_rgb, -1, 0)

    moments = jnp.concatenate([p, p * p, g, g * g, p * g], axis=0)  # [15,H,W]
    b = _blur11(moments)
    mu1, m11, mu2, m22, m12 = b[0:3], b[3:6], b[6:9], b[9:12], b[12:15]
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    sigma1_sq = jnp.maximum(0.0, m11 - mu1_sq)
    sigma2_sq = jnp.maximum(0.0, m22 - mu2_sq)
    sigma12 = m12 - mu1 * mu2
    a_t = mu1_sq + mu2_sq + SSIM_C1
    b_t = sigma1_sq + sigma2_sq + SSIM_C2
    c_t = 2.0 * mu1 * mu2 + SSIM_C1
    d_t = 2.0 * sigma12 + SSIM_C2
    ssim = jnp.clip((c_t * d_t) / (a_t * b_t), -1.0, 1.0)

    loss = cfg.l1_weight * jnp.abs(p - g) + cfg.ssim_weight * ssim  # [3,H,W]
    loss = jnp.moveaxis(loss, 0, -1)  # [H,W,3]

    if cfg.alpha_match:
        if pred.shape[-1] != 4:
            raise ValueError("alpha_match requires RGBA pred")
        amatch = jnp.abs(pred[..., 3] - gt_a)
        loss = jnp.concatenate([loss, amatch[..., None]], axis=-1)

    if cfg.mask:
        loss = loss * gt_a[..., None]
    return loss


def image_loss_map(pred: jnp.ndarray, gt_packed: jnp.ndarray,
                   cfg: ImageLossConfig, bg_dyn=None) -> jnp.ndarray:
    """Per-pixel loss map [H, W, 3|4]; differentiable w.r.t. pred (and
    bg_dyn, a traced composite background overriding cfg.composite_bg)."""
    return _loss_map(pred, gt_packed, cfg, bg_dyn)


def image_loss(pred: jnp.ndarray, gt_packed: jnp.ndarray,
               cfg: ImageLossConfig, match_alpha_weight: float = 0.0,
               bg_dyn=None) -> jnp.ndarray:
    """Scalar training loss, combined like SplatTrainer::step (train.rs:235-241)."""
    lmap = image_loss_map(pred, gt_packed, cfg, bg_dyn)
    if cfg.alpha_match:
        return jnp.mean(lmap[..., :3]) + jnp.mean(lmap[..., 3]) * match_alpha_weight
    return jnp.mean(lmap)


def ssim(pred_rgb: jnp.ndarray, gt_packed: jnp.ndarray,
         composite_bg=None, mask: bool = False) -> jnp.ndarray:
    """Mean SSIM via the fused map with (l1, ssim) weights (0, 1) — the
    reference's eval path (eval.rs:44-49)."""
    cfg = ImageLossConfig(l1_weight=0.0, ssim_weight=1.0,
                          composite_bg=composite_bg, mask=mask)
    return jnp.mean(image_loss_map(pred_rgb[..., :3], gt_packed, cfg))


def psnr(pred_rgb: jnp.ndarray, gt_packed: jnp.ndarray) -> jnp.ndarray:
    """PSNR = 10*log10(1 / mean(|p-g|^2)) on the decoded GT (eval.rs:36-54)."""
    gt_rgb, _ = unpack_gt(gt_packed)
    mse = jnp.mean((pred_rgb[..., :3] - gt_rgb) ** 2)
    return 10.0 * jnp.log10(1.0 / mse)
