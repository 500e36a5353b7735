"""Splat projection & culling: the vectorized equivalent of the reference's
`project_forward` + `project_visible` kernels
(brush-render/src/kernels/project_forward.rs:22-125, project_visible.rs:23-88).

TPU-first design notes (SURVEY.md §7):
* No compaction / atomics — everything is computed for all N (padded-capacity)
  splats with a `visible` mask; downstream tiling sorts culled splats to the
  end with +inf depth keys, keeping the whole step jit-compiled.
* Two-pass NaN safety: pass 1 evaluates every culling gate under
  stop_gradient (no grad paths, NaN-tolerant comparisons); pass 2 runs the
  differentiable math on inputs fully sanitized by that mask. This is the
  "double-where" rule taken to its conclusion — a splat failing ANY gate
  (even a late one like opacity < 1/255, whose sigmoid VJP is inf/inf = NaN
  at raw = -1e38) contributes exactly zero gradient. The reference gets the
  equivalent guarantee by writing dense gradients only for visible splats.
* Gates are positive-phrased so NaN reliably fails them (NaN comparisons are
  False in XLA exactly as in WGSL).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from brush_tpu.camera import CameraModel, Pinhole, is_fisheye
from brush_tpu.constants import (
    ALPHA_CUTOFF_MID,
    COV2D_ENTRY_CLAMP,
    COV_BLUR_DEFAULT,
    COV_BLUR_MIP,
    COLOR_CLAMP,
    MAX_VIEW_Z,
    NEAR_PLANE,
    QUAT_NORM_SQ_MIN,
    SH_COLOR_OFFSET,
    TILE_WIDTH,
)
from brush_tpu.ops import camera_proj
from brush_tpu.ops.sh import sh_to_color


class CameraInputs(NamedTuple):
    """Dynamic per-view uniforms (kernels/types.rs:51-108)."""

    viewmat: jnp.ndarray        # [3,4] world-to-camera
    pinhole: jnp.ndarray        # [fx, fy, cx, cy]
    clamp_limits: jnp.ndarray   # [lim_neg_x, lim_pos_x, lim_neg_y, lim_pos_y]
    cam_pos: jnp.ndarray        # [3] world-space camera position
    half_max_render_fov: jnp.ndarray | float = 0.0  # fisheye cull bound


@struct.dataclass
class ProjectedSplats:
    """Per-splat projected state in original splat order."""

    visible: jnp.ndarray        # [N] bool
    depth: jnp.ndarray          # [N] view-space z
    mean2d: jnp.ndarray         # [N,2] pixel coords
    conic: jnp.ndarray          # [N,3] (c00, c01, c11) of cov2d^-1
    color: jnp.ndarray          # [N,3] SH-evaluated rgb (clamped +-100, +0.5)
    opac: jnp.ndarray           # [N] sigmoid(raw) * mip compensation
    power_threshold: jnp.ndarray  # [N] ln(opac*255)
    tile_min: jnp.ndarray       # [N,2] int32 (tx, ty) inclusive
    tile_max: jnp.ndarray       # [N,2] int32 (tx, ty) exclusive
    num_tiles_bbox: jnp.ndarray  # [N] int32 tiles in clamped bbox
    max_radius: jnp.ndarray     # [N] screen-fraction radius (refine stat)


def _sigmoid(x):
    return 1.0 / (1.0 + jnp.exp(-x))


def _project_math(means, log_scales, quats, sh_coeffs, raw_opacities,
                  cam: CameraInputs, img_size, sh_degree, model,
                  mip_splatting):
    """The full projection math + every gate; assumes inputs won't poison
    gradients (callers sanitize). Returns (ProjectedSplats, ok)."""
    img_w, img_h = img_size
    tile_bw = -(-img_w // TILE_WIDTH)
    tile_bh = -(-img_h // TILE_WIDTH)

    rot = cam.viewmat[:, :3]
    trans = cam.viewmat[:, 3]
    # Unrolled [N,3] x [3,3]^T: tiny-contraction einsums lower to MXU
    # matmuls with K=3 (42x lane waste + multi-pass f32); explicit fused
    # multiply-adds stay on the VPU and run ~10x faster at 1M splats.
    m0, m1, m2 = means[:, 0], means[:, 1], means[:, 2]
    mean_c = jnp.stack([
        m0 * rot[0, 0] + m1 * rot[0, 1] + m2 * rot[0, 2] + trans[0],
        m0 * rot[1, 0] + m1 * rot[1, 1] + m2 * rot[1, 2] + trans[1],
        m0 * rot[2, 0] + m1 * rot[2, 1] + m2 * rot[2, 2] + trans[2],
    ], axis=-1)

    # --- Culling gates (project_forward.rs:44-111) ---
    z = mean_c[..., 2]
    ok = jnp.all(jnp.isfinite(mean_c), axis=-1) & (z <= MAX_VIEW_Z)
    if is_fisheye(model):
        r = jnp.sqrt(mean_c[..., 0] ** 2 + mean_c[..., 1] ** 2)
        theta = jnp.arctan2(r, z)
        ok &= theta <= cam.half_max_render_fov
    else:
        ok &= z >= NEAR_PLANE

    scale = jnp.exp(log_scales)
    ok &= jnp.all(jnp.isfinite(scale), axis=-1)

    qnorm_sq = jnp.sum(quats * quats, axis=-1)
    ok &= (qnorm_sq >= QUAT_NORM_SQ_MIN) & jnp.isfinite(qnorm_sq)
    ok &= jnp.isfinite(raw_opacities)

    qn = quats / jnp.sqrt(jnp.maximum(qnorm_sq[:, None], 1e-32))

    # --- cov2d (helpers.rs calc_cov2d:142-171) ---
    # Fully unrolled J @ (R_cam @ R_quat * scale): same einsum-on-MXU issue
    # as mean_c above — per-splat 2x3 @ 3x3 chains are elementwise work.
    qw, qx, qy, qz = qn[:, 0], qn[:, 1], qn[:, 2], qn[:, 3]
    xx, yy, zz = qx * qx, qy * qy, qz * qz
    xy, xz, yz = qx * qy, qx * qz, qy * qz
    wx, wy, wz = qw * qx, qw * qy, qw * qz
    q_rows = (
        (1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy)),
        (2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx)),
        (2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy)),
    )
    s0, s1, s2 = scale[:, 0], scale[:, 1], scale[:, 2]
    # ns[i][k] = (rot @ R_q)[i,k] * scale[k]; rot entries are scalars.
    ns = [
        [
            (rot[i, 0] * q_rows[0][k] + rot[i, 1] * q_rows[1][k]
             + rot[i, 2] * q_rows[2][k]) * (s0, s1, s2)[k]
            for k in range(3)
        ]
        for i in range(3)
    ]
    jac = camera_proj.projection_jacobian(mean_c, cam.pinhole,
                                          cam.clamp_limits, model)
    j = [[jac[:, a, b] for b in range(3)] for a in range(2)]
    v = [
        [j[a][0] * ns[0][k] + j[a][1] * ns[1][k] + j[a][2] * ns[2][k]
         for k in range(3)]
        for a in range(2)
    ]
    c00 = v[0][0] * v[0][0] + v[0][1] * v[0][1] + v[0][2] * v[0][2]
    c01 = v[0][0] * v[1][0] + v[0][1] * v[1][1] + v[0][2] * v[1][2]
    c11 = v[1][0] * v[1][0] + v[1][1] * v[1][1] + v[1][2] * v[1][2]
    max_abs = jnp.maximum(jnp.maximum(jnp.abs(c00), jnp.abs(c11)), jnp.abs(c01))
    scale_down = jnp.where(max_abs > COV2D_ENTRY_CLAMP,
                           COV2D_ENTRY_CLAMP / jnp.maximum(max_abs, 1e-30), 1.0)
    c00, c01, c11 = c00 * scale_down, c01 * scale_down, c11 * scale_down

    # --- Mip blur + compensation (helpers.rs compensate_cov2d:177-191) ---
    blur = COV_BLUR_MIP if mip_splatting else COV_BLUR_DEFAULT
    b00, b11 = c00 + blur, c11 + blur
    if mip_splatting:
        det_raw = jnp.maximum(c00 * c11 - c01 * c01, 0.0)
        det_blur = b00 * b11 - c01 * c01
        filter_comp = jnp.sqrt(det_raw / det_blur)
    else:
        filter_comp = 1.0

    opac = _sigmoid(raw_opacities) * filter_comp
    ok &= jnp.isfinite(b00) & jnp.isfinite(b11) & jnp.isfinite(c01)
    ok &= opac >= ALPHA_CUTOFF_MID

    # --- conic = cov2d^-1, zero when non-PD (brush-cube Sym2::inverse) ---
    det = b00 * b11 - c01 * c01
    inv_det = jnp.where(det > 0.0, 1.0 / jnp.where(det > 0.0, det, 1.0), 0.0)
    conic = jnp.stack([b11 * inv_det, -c01 * inv_det, b00 * inv_det], axis=-1)

    mean2d = camera_proj.project(mean_c, cam.pinhole, model)

    # --- bbox extent (helpers.rs compute_bbox_extent:80-90) ---
    power_threshold = jnp.log(jnp.maximum(opac, 1e-30) * 255.0)
    cdet = conic[:, 0] * conic[:, 2] - conic[:, 1] * conic[:, 1]
    degenerate = cdet <= 0.0
    cinv_det = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, cdet))
    ex = jnp.sqrt(jnp.maximum(2.0 * power_threshold * conic[:, 2] * cinv_det, 0.0))
    ey = jnp.sqrt(jnp.maximum(2.0 * power_threshold * conic[:, 0] * cinv_det, 0.0))
    ok &= ~degenerate

    on_screen = (
        (mean2d[:, 0] + ex > 0.0)
        & (mean2d[:, 0] - ex < img_w)
        & (mean2d[:, 1] + ey > 0.0)
        & (mean2d[:, 1] - ey < img_h)
    )
    ok &= on_screen

    # --- tile bbox (helpers.rs get_tile_bbox/get_bbox:107-136) ---
    tw = float(TILE_WIDTH)
    min_x = jnp.clip(mean2d[:, 0] / tw - ex / tw, 0.0, tile_bw).astype(jnp.int32)
    min_y = jnp.clip(mean2d[:, 1] / tw - ey / tw, 0.0, tile_bh).astype(jnp.int32)
    max_x = jnp.clip(mean2d[:, 0] / tw + ex / tw + 1.0, 0.0, tile_bw).astype(jnp.int32)
    max_y = jnp.clip(mean2d[:, 1] / tw + ey / tw + 1.0, 0.0, tile_bh).astype(jnp.int32)
    num_tiles_bbox = jnp.where(ok, (max_x - min_x) * (max_y - min_y), 0)

    # --- SH color along viewdir (project_visible.rs:54-71) ---
    viewdir_raw = means - cam.cam_pos
    norm = jnp.linalg.norm(viewdir_raw, axis=-1, keepdims=True)
    viewdir = viewdir_raw / jnp.where(norm > 1e-12, norm, 1.0)
    color_raw = sh_to_color(sh_coeffs, viewdir, sh_degree) + SH_COLOR_OFFSET
    color_finite = jnp.isfinite(color_raw)
    color = jnp.where(color_finite, color_raw, 0.0)
    color = jnp.clip(color, -COLOR_CLAMP, COLOR_CLAMP)

    max_radius = jnp.where(ok, jnp.maximum(ex / img_w, ey / img_h), 0.0)

    proj = ProjectedSplats(
        visible=ok,
        depth=z,
        mean2d=mean2d,
        conic=conic,
        color=color,
        opac=opac,
        power_threshold=power_threshold,
        tile_min=jnp.stack([min_x, min_y], axis=-1),
        tile_max=jnp.stack([max_x, max_y], axis=-1),
        num_tiles_bbox=num_tiles_bbox,
        max_radius=max_radius,
    )
    return proj, ok, color_finite


def project_splats(
    means: jnp.ndarray,          # [N,3]
    log_scales: jnp.ndarray,     # [N,3]
    quats: jnp.ndarray,          # [N,4] wxyz, not necessarily normalized
    sh_coeffs: jnp.ndarray,      # [N,K,3]
    raw_opacities: jnp.ndarray,  # [N]
    cam: CameraInputs,
    img_size: tuple[int, int],   # (w, h), static
    *,
    sh_degree: int,
    model: CameraModel = Pinhole(),
    mip_splatting: bool = False,
) -> ProjectedSplats:
    # Pass 1: gates only, gradient-free (NaN comparisons are just False).
    sg = jax.lax.stop_gradient
    _, ok, chan_finite = _project_math(
        sg(means), sg(log_scales), sg(quats), sg(sh_coeffs),
        sg(raw_opacities), cam, img_size, sh_degree, model, mip_splatting)

    # Pass 2: differentiable math on sanitized inputs. Culled splats become
    # an inert unit splat in front of the camera with ~zero opacity, whose
    # gradient chain is finite everywhere and receives zero cotangents.
    okc = ok[:, None]
    means_s = jnp.where(okc, means, cam.cam_pos + jnp.array([0.0, 0.0, 1.0]))
    ls_s = jnp.where(okc, log_scales, 0.0)
    quats_s = jnp.where(okc, quats, jnp.array([1.0, 0.0, 0.0, 0.0]))
    # SH sanitized per-coefficient: gates don't check SH (the reference
    # renders NaN-SH splats with a scrubbed color), so poisoned
    # coefficients on VISIBLE rows must still be kept out of the
    # differentiable math — the viewdir gradient multiplies coefficient
    # values (kernels/sh.rs sh_color_viewdir_vjp).
    sh_s = jnp.where(jnp.isfinite(sh_coeffs) & ok[:, None, None],
                     sh_coeffs, 0.0)
    opac_s = jnp.where(ok, raw_opacities, -10.0)

    proj, ok2, _ = _project_math(means_s, ls_s, quats_s, sh_s, opac_s,
                                 cam, img_size, sh_degree, model,
                                 mip_splatting)
    visible = ok & ok2
    # Forward parity with the reference's NaN-scrub: a channel whose true
    # (unsanitized) SH sum was non-finite renders as 0, not as the partial
    # sum of its finite coefficients.
    color = jnp.where(chan_finite, proj.color, 0.0)
    return proj.replace(
        visible=visible,
        color=color,
        num_tiles_bbox=jnp.where(visible, proj.num_tiles_bbox, 0),
        max_radius=jnp.where(visible, proj.max_radius, 0.0),
    )
