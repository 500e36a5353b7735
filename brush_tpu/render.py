"""Full differentiable render pipeline.

TPU-native counterpart of the reference's forward dispatch
(brush-render/src/render.rs:39-280) + autodiff glue
(brush-render-bwd/src/burn_glue.rs): one jit-compilable function

    project -> depth sort -> isect expansion -> tile sort -> rasterize

where only `rasterize` carries a custom VJP; everything else is plain jnp
and differentiates automatically (gathers become scatter-adds in reverse
mode — the role of the reference's hand-written project_backwards kernel).

Static configuration (img_size, sh_degree, camera-model type, capacities,
mip flag) mirrors the reference's comptime kernel specialization
(SURVEY.md Appendix B); per-view scalars stay dynamic.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from brush_tpu.camera import Camera, CameraModel, Pinhole, is_fisheye
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.projection import CameraInputs, ProjectedSplats, project_splats
from brush_tpu.ops.rasterize_jnp import rasterize, rasterize_with_visibility
from brush_tpu.ops.rasterize_pallas import rasterize_pallas
from brush_tpu.ops.tiling import Intersections, build_intersections


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static render configuration (one jit specialization per value)."""

    img_size: Tuple[int, int]          # (w, h)
    sh_degree: int = 3
    model: CameraModel = Pinhole()
    mip_splatting: bool = False
    isect_cap: int = 1 << 16           # REMAINDER slot capacity (slots past
    #   each splat's first expand_k0 bbox tiles; aux.num_isects reports the
    #   needed value for overflow retry)
    expand_k0: int = 4                 # dense expansion width per splat
    chunk_cap: int | None = None       # backward gradient chunk rows
    #   (None = safe bound; set tighter to shrink the backward reduce)
    max_per_tile: int = 1024           # jnp-rasterizer per-tile bound
    chunk: int = 32
    smooth_cutoff: bool = False        # test-only C^1 alpha cutoff
    use_pallas: bool = False           # production Pallas kernels
    forward_only: bool = False         # inference specialization: skip ALL
    #   backward bookkeeping (gid sort payload, surv-segment cumsums,
    #   final_T/useful-range outputs) — the reference's comptime
    #   bwd_info=false kernel variant (rasterize.rs:172-177). The returned
    #   image carries no gradients.

    @property
    def tile_grid(self) -> Tuple[int, int]:
        w, h = self.img_size
        return (-(-w // TILE_WIDTH), -(-h // TILE_WIDTH))

    def resolved_chunk_cap(self, n_splats: int) -> int:
        if self.chunk_cap is not None:
            return self.chunk_cap
        from brush_tpu.ops.tiling import CK
        s_cap = n_splats * self.expand_k0 + self.isect_cap
        tw, th = self.tile_grid
        return s_cap // CK + tw * th


@struct.dataclass
class RenderAux:
    """Side outputs of a render (reference: render_aux.rs:73)."""

    num_visible: jnp.ndarray        # [] int32
    num_isects: jnp.ndarray         # [] int32 remainder slots needed —
    #   compare against isect_cap for overflow/retry!
    num_bbox_tail: jnp.ndarray      # [] int32 slots on bbox-tail semantics
    #   (exact gaussian-vs-tile test bypassed past B_SCAN) — telemetry for
    #   the exact-emission saving (VERDICT r3 #9; no-silent-caps rule)
    max_isects_per_tile: jnp.ndarray  # [] int32 — compare against max_per_tile!
    visible: jnp.ndarray            # [N] 1.0 where splat is visible. Path
    #   semantics (reference: bwd_info rasterize marks blended splats,
    #   rasterize.rs:150-156):
    #   - jnp oracle path: EXACT contribution visibility (blended somewhere).
    #   - Pallas training path: BINNED visibility — passed every cull gate
    #     and emitted >= 1 tile slot; a conservative superset (an occluded
    #     splat is still marked). Exact contribution visibility is the
    #     visible_holder gradient (render_with_refine), which the trainer
    #     uses for refine stats.
    #   - forward_only path: all zeros (no per-splat bookkeeping exists in
    #     the inference kernel, by design — don't read it there).
    max_radius: jnp.ndarray         # [N] screen-fraction radius
    final_t: jnp.ndarray | None = None
    num_chunks: jnp.ndarray | None = None  # [] int32 — compare against
    #   RenderConfig.chunk_cap (backward gradient capacity) for retry


def camera_inputs(cam: Camera, img_size: Tuple[int, int]) -> CameraInputs:
    """Host-side Camera -> device uniforms."""
    return CameraInputs(
        viewmat=jnp.asarray(cam.viewmat()),
        pinhole=jnp.asarray(cam.pinhole_params(img_size)),
        clamp_limits=jnp.asarray(cam.jacobian_clamp_limits(img_size)),
        cam_pos=jnp.asarray(cam.position, dtype=jnp.float32),
        half_max_render_fov=cam.half_max_render_fov() if is_fisheye(cam.model) else 0.0,
    )


def render(
    means: jnp.ndarray,
    log_scales: jnp.ndarray,
    quats: jnp.ndarray,
    sh_coeffs: jnp.ndarray,
    raw_opacities: jnp.ndarray,
    cam: CameraInputs,
    bg: jnp.ndarray,
    cfg: RenderConfig,
) -> tuple[jnp.ndarray, RenderAux]:
    """Render one view. Returns ([H, W, 4] f32 image, RenderAux).

    Fully differentiable w.r.t. the five splat parameter arrays. The refine
    weight (densify signal) is exposed by `render_with_refine`.
    """
    img, aux, _ = _render_impl(
        means, log_scales, quats, sh_coeffs, raw_opacities, cam, bg, cfg,
        refine_holder=None, with_visibility=not cfg.use_pallas)
    return img, aux


def render_with_refine(
    means, log_scales, quats, sh_coeffs, raw_opacities, cam, bg, cfg,
    refine_holder: jnp.ndarray,
    visible_holder: jnp.ndarray | None = None,
):
    """Like `render` but threads zeros-[N] holders whose gradients carry the
    per-splat refine weight and visibility mask (burn_glue.rs:252,269)."""
    img, aux, _ = _render_impl(
        means, log_scales, quats, sh_coeffs, raw_opacities, cam, bg, cfg,
        refine_holder=refine_holder, visible_holder=visible_holder)
    return img, aux


def _render_impl(means, log_scales, quats, sh_coeffs, raw_opacities, cam, bg,
                 cfg: RenderConfig, refine_holder, visible_holder=None,
                 with_visibility: bool = False):
    # Named scopes mirror the reference's tracing spans (render.rs:103-267);
    # they appear in jax.profiler / xprof traces (SURVEY.md §5.1).
    with jax.named_scope("ProjectSplats"):
        proj = project_splats(
            means, log_scales, quats, sh_coeffs, raw_opacities, cam,
            cfg.img_size, sh_degree=cfg.sh_degree, model=cfg.model,
            mip_splatting=cfg.mip_splatting)
    fwd_only = cfg.forward_only and cfg.use_pallas
    with jax.named_scope("TileBinning"):
        isect = build_intersections(proj, cfg.img_size, cfg.isect_cap,
                                    expand_k0=cfg.expand_k0,
                                    chunk_cap=cfg.chunk_cap,
                                    with_bwd_info=not fwd_only)

    n = means.shape[0]
    if refine_holder is None:
        refine_holder = jnp.zeros(n, jnp.float32)
    if visible_holder is None:
        visible_holder = jnp.zeros(n, jnp.float32)

    if fwd_only:
        with jax.named_scope("Rasterize"):
            from brush_tpu.ops.rasterize_pallas import (
                _use_interpret, rasterize_forward_pallas, tiles_to_image)
            tiles = rasterize_forward_pallas(
                isect.soa, isect.tile_ranges, bg, cfg.img_size,
                interpret=_use_interpret(), fwd_only=True)
            img = tiles_to_image(tiles, cfg.img_size)
    elif cfg.use_pallas:
        with jax.named_scope("Rasterize"):
            img = rasterize_pallas(
                proj.mean2d, proj.conic, proj.color, proj.opac,
                refine_holder, visible_holder,
                isect.soa, isect.tile_ranges, isect.chunk_starts,
                isect.num_chunks, isect.surv_starts_g,
                isect.surv_counts_g, bg, cfg.img_size,
                cfg.resolved_chunk_cap(n))
    else:
        img = rasterize(
            proj.mean2d, proj.conic, proj.color, proj.opac,
            refine_holder, visible_holder,
            isect.gid_from_isect, isect.tile_ranges, bg,
            cfg.img_size, cfg.max_per_tile, cfg.chunk, cfg.smooth_cutoff)

    per_tile = isect.tile_ranges[:, 1] - isect.tile_ranges[:, 0]
    if with_visibility:
        visible = _visibility(proj, isect, cfg)
    elif not fwd_only:
        # Pallas path: binned visibility from the surviving-slot counts the
        # backward bookkeeping already computes (see RenderAux.visible).
        visible = (isect.surv_counts_g > 0).astype(jnp.float32)
    else:
        visible = jnp.zeros(n, jnp.float32)
    aux = RenderAux(
        num_visible=isect.num_visible,
        num_isects=isect.num_isects,
        num_bbox_tail=isect.num_bbox_tail,
        max_isects_per_tile=jnp.max(per_tile),
        visible=visible,
        max_radius=proj.max_radius,
        num_chunks=isect.num_chunks,
    )
    return img, aux, isect


def _visibility(proj: ProjectedSplats, isect: Intersections, cfg: RenderConfig):
    return rasterize_with_visibility(
        proj.mean2d, proj.conic, proj.color, proj.opac,
        isect.gid_from_isect, isect.tile_ranges,
        cfg.img_size, cfg.max_per_tile, cfg.chunk)


def pack_image_u8(img: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 4] f32 -> [H, W, 4] u8, matching the reference's packed forward
    output path (rasterize.rs:172-177)."""
    return jnp.clip(img * 255.0, 0.0, 255.0).astype(jnp.uint8)


def required_isect_cap(aux: RenderAux) -> int:
    """Host helper: padded capacity that would fit this view (pow2-rounded)."""
    n = int(aux.num_isects)
    return 1 << max(10, int(np.ceil(np.log2(max(n, 1)))))
