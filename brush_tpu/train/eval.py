"""Evaluation: PSNR / SSIM over eval views.

Counterpart of brush-train/src/eval.rs:22-63: render on a black background,
simulate the 8-bit roundtrip, PSNR = 10*log10(1 / mean(L1^2)), SSIM via the
fused loss map."""

from __future__ import annotations

import dataclasses
import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.models.splats import Splats
from brush_tpu.ops import loss as loss_mod
from brush_tpu.render import RenderConfig, camera_inputs, render


@dataclasses.dataclass
class EvalStats:
    psnr: float
    ssim: float
    per_view_psnr: list
    per_view_ssim: list


@functools.lru_cache(maxsize=8)
def _eval_step_fn(rcfg: RenderConfig):
    """Jitted render + 8-bit roundtrip + metrics for one view.

    MUST be jitted: EAGER execution of the forward-only render pipeline
    on the TPU backend produces wrong pixels (measured ~0.8 max diff /
    1M pixels vs the jitted program on a converged model — ~6 dB of
    reported eval PSNR), while the jitted render is bit-consistent with
    the training path. The exact eager-mode culprit is unisolated (a
    minimal f16-pack repro shows no eager/jit gap); until it is, every
    production render call must go through jit — which eval wants anyway
    (per-op dispatch of the full pipeline is ~50x slower per view).
    CPU runs (and every CPU test) are unaffected, which is why only the
    on-chip quality protocol caught it.
    """
    @jax.jit
    def step(means, log_scales, quats, sh_coeffs, raw_opacities, cam,
             gt_packed):
        black = jnp.zeros(3, jnp.float32)
        img, aux = render(means, log_scales, quats, sh_coeffs,
                          raw_opacities, cam, black, rcfg)
        # 8-bit roundtrip simulation (eval.rs:36-43).
        rgb = jnp.round(jnp.clip(img[..., :3], 0.0, 1.0) * 255.0) / 255.0
        over = aux.num_isects
        if not rcfg.use_pallas:
            over = jnp.maximum(
                over, jnp.where(
                    aux.max_isects_per_tile > rcfg.max_per_tile,
                    jnp.int32(rcfg.isect_cap + 1), 0))
        return (rgb, loss_mod.psnr(rgb, gt_packed),
                loss_mod.ssim(rgb, gt_packed), over)
    return step


def eval_views(splats: Splats, views, rcfg: RenderConfig,
               save_dir: str | None = None, step: int = 0) -> EvalStats:
    """`views`: iterable of (camera, gt_packed [H,W] u32) pairs.
    With `save_dir`, each rendered eval view is saved as a PNG
    (eval.rs:56-63's per-view save-to-disk)."""
    psnrs, ssims = [], []
    folded = splats.fold_min_scale()
    for i, (camera, gt_packed) in enumerate(views):
        cam = camera_inputs(camera, rcfg.img_size)
        rgb, p, s, num_isects = _eval_step_fn(rcfg)(
            folded.means, folded.log_scales, folded.quats,
            folded.sh_coeffs, folded.raw_opacities, cam, gt_packed)

        # Overflow would silently drop contributions and corrupt PSNR;
        # retry with doubled capacity (the training loop's grow-on-
        # overflow policy, process.py).
        def overflowed(num_isects, rcfg):
            return int(num_isects) > rcfg.isect_cap

        while overflowed(num_isects, rcfg):
            rcfg = dataclasses.replace(
                rcfg, isect_cap=rcfg.isect_cap * 2,
                max_per_tile=rcfg.max_per_tile * 2)
            rgb, p, s, num_isects = _eval_step_fn(rcfg)(
                folded.means, folded.log_scales, folded.quats,
                folded.sh_coeffs, folded.raw_opacities, cam, gt_packed)
        psnrs.append(float(p))
        ssims.append(float(s))
        if save_dir is not None:
            from pathlib import Path

            from PIL import Image
            d = Path(save_dir)
            d.mkdir(parents=True, exist_ok=True)
            Image.fromarray(
                (np.asarray(rgb) * 255.0).astype(np.uint8)).save(
                    d / f"eval_{step:06d}_view{i:03d}.png")
    return EvalStats(
        psnr=float(np.mean(psnrs)) if psnrs else float("nan"),
        ssim=float(np.mean(ssims)) if ssims else float("nan"),
        per_view_psnr=psnrs,
        per_view_ssim=ssims,
    )
