"""Evaluation: PSNR / SSIM over eval views.

Counterpart of brush-train/src/eval.rs:22-63: render on a black background,
simulate the 8-bit roundtrip, PSNR = 10*log10(1 / mean(L1^2)), SSIM via the
fused loss map."""

from __future__ import annotations

import dataclasses
from typing import Sequence

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


def eval_views(splats: Splats, views, rcfg: RenderConfig,
               save_dir: str | None = None, step: int = 0) -> EvalStats:
    """`views`: iterable of (camera, gt_packed [H,W] u32) pairs.
    With `save_dir`, each rendered eval view is saved as a PNG
    (eval.rs:56-63's per-view save-to-disk)."""
    psnrs, ssims = [], []
    folded = splats.fold_min_scale()
    black = jnp.zeros(3, jnp.float32)
    for i, (camera, gt_packed) in enumerate(views):
        cam = camera_inputs(camera, rcfg.img_size)
        img, aux = render(folded.means, folded.log_scales, folded.quats,
                          folded.sh_coeffs, folded.raw_opacities,
                          cam, black, rcfg)
        # Overflow would silently drop contributions and corrupt PSNR;
        # retry once with doubled capacity (the training loop's grow-on-
        # overflow policy, process.py).
        def overflowed(aux):
            if int(aux.num_isects) > rcfg.isect_cap:
                return True
            return (not rcfg.use_pallas
                    and int(aux.max_isects_per_tile) > rcfg.max_per_tile)

        while overflowed(aux):
            rcfg = dataclasses.replace(
                rcfg, isect_cap=rcfg.isect_cap * 2,
                max_per_tile=rcfg.max_per_tile * 2)
            img, aux = render(folded.means, folded.log_scales, folded.quats,
                              folded.sh_coeffs, folded.raw_opacities,
                              cam, black, rcfg)
        # 8-bit roundtrip simulation (eval.rs:36-43).
        rgb = jnp.round(jnp.clip(img[..., :3], 0.0, 1.0) * 255.0) / 255.0
        psnrs.append(float(loss_mod.psnr(rgb, gt_packed)))
        ssims.append(float(loss_mod.ssim(rgb, gt_packed)))
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
