"""Reference rasterizer in plain XLA (jnp) with a custom VJP.

Mathematical spec for the Pallas production kernel (ops/rasterize_pallas.py)
and the correctness oracle for its gradients. Mirrors the reference's
tile-based front-to-back blending (brush-render/src/kernels/rasterize.rs) but
restructured for a vector machine:

* The per-pixel sequential `T *= (1 - alpha)` loop becomes a *cumulative
  product over a chunk of splats* — per chunk, transmittance prefixes,
  blend weights, and color accumulation are all data-parallel [CK, 256]
  tensor ops (on TPU these map onto VPU lanes / MXU contractions instead of
  warp lanes). The per-pixel early-out `next_T <= 1e-4` (rasterize.rs:138)
  becomes a monotone prefix test on the cumulative transmittance plus a
  carried `done` mask.
* Gradients: wrapped in `jax.custom_vjp`. The backward re-runs the forward
  under `jax.vjp` with the splat screen positions broadcast per-pixel, which
  yields the per-(splat, pixel) position gradients needed for the densify
  "refine weight" Sum_p |v_xy * img_size| / max(final_alpha_p, 1e-5)
  (rasterize_backwards.rs:369-375) — surfaced as the cotangent of the dummy
  `refine_holder` input, exactly like the reference's refine_weight_holder
  (brush-render-bwd/src/burn_glue.rs:252,269).

Capacity note: each tile processes at most `max_per_tile` intersections
(static). The true per-tile maximum is returned by render aux so callers can
detect overflow; the Pallas kernel has no such bound.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.constants import (
    ALPHA_CUTOFF_BAND,
    ALPHA_CUTOFF_MID,
    ALPHA_CAP,
    REFINE_ALPHA_FLOOR,
    REFINE_WEIGHT_CLAMP,
    TILE_WIDTH,
    TRANSMITTANCE_EPS,
)

TILE_PIX = TILE_WIDTH * TILE_WIDTH


def _tile_pixel_coords(img_size):
    """Pixel-center coordinates per (tile, pixel-in-tile): two [T, 256] arrays."""
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    t = np.arange(tbw * tbh)
    p = np.arange(TILE_PIX)
    px = (t % tbw)[:, None] * TILE_WIDTH + (p % TILE_WIDTH)[None, :] + 0.5
    py = (t // tbw)[:, None] * TILE_WIDTH + (p // TILE_WIDTH)[None, :] + 0.5
    return jnp.asarray(px, jnp.float32), jnp.asarray(py, jnp.float32)


def _alpha_cutoff_weight(alpha):
    """C^1 smoothstep around the 1/255 cutoff, test-only (helpers.rs:26-33)."""
    t = jnp.clip(
        (alpha - (ALPHA_CUTOFF_MID - 0.5 * ALPHA_CUTOFF_BAND)) / ALPHA_CUTOFF_BAND,
        0.0,
        1.0,
    )
    return t * t * (3.0 - 2.0 * t)


def _blend_tiles(
    xy_pp,        # [T, M, P, 2] per-pixel-broadcast splat centers
    conic_g,      # [T, M, 3]
    color_g,      # [T, M, 3]
    opac_g,       # [T, M]
    valid,        # [T, M] bool — isect slot within the tile's range
    bg,           # [3]
    px, py,       # [T, P]
    chunk: int,
    smooth_cutoff: bool,
):
    """Front-to-back blend; differentiable. Returns rgb [T,P,3], T_final [T,P]."""
    n_tiles, m = xy_pp.shape[0], xy_pp.shape[1]
    p = px.shape[1]
    assert m % chunk == 0
    steps = m // chunk

    def body(carry, inputs):
        t_in, done = carry
        xy_c, conic_c, color_c, opac_c, valid_c = inputs
        dx = px[:, None, :] - xy_c[..., 0]   # [T, CK, P]
        dy = py[:, None, :] - xy_c[..., 1]
        c00 = conic_c[..., 0:1]
        c01 = conic_c[..., 1:2]
        c11 = conic_c[..., 2:3]
        sigma = 0.5 * (c00 * dx * dx + c11 * dy * dy) + c01 * dx * dy
        alpha = jnp.minimum(ALPHA_CAP, opac_c[..., None] * jnp.exp(-sigma))
        if smooth_cutoff:
            w_cut = _alpha_cutoff_weight(alpha)
        else:
            w_cut = (alpha >= ALPHA_CUTOFF_MID).astype(alpha.dtype)
        gate = (sigma >= 0.0) & valid_c[..., None]
        a = jnp.where(gate, alpha * w_cut, 0.0)

        one_minus = 1.0 - a
        cp = jnp.cumprod(one_minus, axis=1)
        s_incl = t_in[:, None, :] * cp
        s_excl = t_in[:, None, :] * jnp.concatenate(
            [jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=1)
        blended = (s_incl > TRANSMITTANCE_EPS) & ~done[:, None, :]
        w = jnp.where(blended, a * s_excl, 0.0)

        cmax = jnp.maximum(color_c, 0.0)
        rgb_c = jnp.einsum("tjp,tjc->tpc", w, cmax,
                           precision=jax.lax.Precision.HIGHEST)
        t_out = t_in * jnp.prod(jnp.where(blended, one_minus, 1.0), axis=1)
        done_out = done | jnp.any(s_incl <= TRANSMITTANCE_EPS, axis=1)
        return (t_out, done_out), rgb_c

    def split(x):
        return x.reshape((n_tiles, steps, chunk) + x.shape[2:]).swapaxes(0, 1)

    init = (
        jnp.ones((n_tiles, p), jnp.float32),
        jnp.zeros((n_tiles, p), bool),
    )
    (t_final, _), rgb_steps = jax.lax.scan(
        jax.checkpoint(body),
        init,
        (split(xy_pp), split(conic_g), split(color_g), split(opac_g), split(valid)),
    )
    rgb = jnp.sum(rgb_steps, axis=0) + t_final[..., None] * bg
    return rgb, t_final


def _gather_tile_isects(gid_from_isect, tile_ranges, max_per_tile):
    """[T, M] global splat ids + validity for the first M isects of each tile."""
    n_isect = gid_from_isect.shape[0]
    offs = jnp.arange(max_per_tile, dtype=jnp.int32)
    idx = tile_ranges[:, 0:1] + offs[None, :]
    valid = idx < tile_ranges[:, 1:2]
    gid = gid_from_isect[jnp.clip(idx, 0, n_isect - 1)]
    return gid, valid


def _tiles_to_image(arr, img_size):
    """[T, 256, C] tile-major pixels -> [H, W, C] image (cropped)."""
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    c = arr.shape[-1]
    img = arr.reshape(tbh, tbw, TILE_WIDTH, TILE_WIDTH, c)
    img = img.transpose(0, 2, 1, 3, 4).reshape(tbh * TILE_WIDTH, tbw * TILE_WIDTH, c)
    return img[:img_h, :img_w]


def _forward_common(mean2d, conic, color, opac, gid_from_isect, tile_ranges, bg,
                    img_size, max_per_tile, chunk, smooth_cutoff,
                    *, broadcast_xy: bool):
    px, py = _tile_pixel_coords(img_size)
    gid, valid = _gather_tile_isects(gid_from_isect, tile_ranges, max_per_tile)
    xy_g = mean2d[gid]
    if broadcast_xy:
        xy_pp = jnp.broadcast_to(
            xy_g[:, :, None, :], xy_g.shape[:2] + (TILE_PIX, 2))
    else:
        xy_pp = xy_g[:, :, None, :]
    rgb, t_final = _blend_tiles(
        xy_pp, conic[gid], color[gid], opac[gid], valid, bg, px, py,
        chunk, smooth_cutoff)
    img = jnp.concatenate([rgb, 1.0 - t_final[..., None]], axis=-1)
    return _tiles_to_image(img, img_size), (gid, valid, t_final)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12))
def rasterize(mean2d, conic, color, opac, refine_holder, visible_holder,
              gid_from_isect, tile_ranges, bg,
              img_size, max_per_tile, chunk=32, smooth_cutoff=False):
    """Rasterize projected splats to an [H, W, 4] float image.

    Differentiable w.r.t. mean2d/conic/color/opac/bg; the cotangents of the
    zeros-[N] dummies `refine_holder`/`visible_holder` carry the densify
    refine weight and the contributed-visibility mask (the reference's
    refine_weight_holder + `visible` buffer, burn_glue.rs:252,269).
    """
    img, _ = _forward_common(
        mean2d, conic, color, opac, gid_from_isect, tile_ranges, bg,
        img_size, max_per_tile, chunk, smooth_cutoff, broadcast_xy=False)
    return img


def _rasterize_fwd(mean2d, conic, color, opac, refine_holder, visible_holder,
                   gid_from_isect, tile_ranges, bg,
                   img_size, max_per_tile, chunk, smooth_cutoff):
    img, _ = _forward_common(
        mean2d, conic, color, opac, gid_from_isect, tile_ranges, bg,
        img_size, max_per_tile, chunk, smooth_cutoff, broadcast_xy=False)
    res = (mean2d, conic, color, opac, gid_from_isect, tile_ranges, bg)
    return img, res


def _rasterize_bwd(img_size, max_per_tile, chunk, smooth_cutoff, res, v_img):
    mean2d, conic, color, opac, gid_from_isect, tile_ranges, bg = res
    n = mean2d.shape[0]
    img_w, img_h = img_size

    px, py = _tile_pixel_coords(img_size)
    gid, valid = _gather_tile_isects(gid_from_isect, tile_ranges, max_per_tile)
    xy_pp = jnp.broadcast_to(
        mean2d[gid][:, :, None, :], gid.shape + (TILE_PIX, 2))

    def f(xy_pp_, conic_n, color_n, opac_n, bg_):
        rgb, t_final = _blend_tiles(
            xy_pp_, conic_n[gid], color_n[gid], opac_n[gid], valid, bg_,
            px, py, chunk, smooth_cutoff)
        img = jnp.concatenate([rgb, 1.0 - t_final[..., None]], axis=-1)
        return _tiles_to_image(img, img_size), t_final

    (_, t_final), vjp_fn = jax.vjp(
        lambda *a: f(*a), xy_pp, conic, color, opac, bg)
    v_xy_pp, v_conic, v_color, v_opac, v_bg = vjp_fn(
        (v_img, jnp.zeros_like(t_final)))

    # Per-pixel xy grads -> dense v_mean2d by scatter over gids.
    v_xy_isect = jnp.sum(v_xy_pp, axis=2)  # [T, M, 2]
    vsel = valid[..., None]
    v_mean2d = jnp.zeros((n, 2), mean2d.dtype).at[gid].add(
        jnp.where(vsel, v_xy_isect, 0.0))

    # Refine weight: Sum_p ||v_xy .* img_size|| / max(final_alpha, 1e-5)
    # (rasterize_backwards.rs:369-375), clamped & NaN-scrubbed like
    # project_backwards.rs:186-188.
    final_a = 1.0 - t_final  # [T, P]
    scale = jnp.array([img_w, img_h], jnp.float32)
    norm = jnp.sqrt(jnp.sum((v_xy_pp * scale) ** 2, axis=-1))  # [T, M, P]
    contrib = norm / jnp.maximum(final_a[:, None, :], REFINE_ALPHA_FLOOR)
    refine_isect = jnp.sum(jnp.where(valid[..., None], contrib, 0.0), axis=2)
    v_refine = jnp.zeros((n,), jnp.float32).at[gid].add(refine_isect)
    v_refine = jnp.clip(jnp.nan_to_num(v_refine, nan=0.0), 0.0, REFINE_WEIGHT_CLAMP)

    v_visible = rasterize_with_visibility(
        mean2d, conic, color, opac, gid_from_isect, tile_ranges,
        img_size, max_per_tile, chunk)

    zero_int = lambda x: np.zeros(x.shape, jax.dtypes.float0)
    return (v_mean2d, v_conic, v_color, v_opac, v_refine, v_visible,
            zero_int(gid_from_isect), zero_int(tile_ranges), v_bg)


rasterize.defvjp(_rasterize_fwd, _rasterize_bwd)


def rasterize_with_visibility(mean2d, conic, color, opac,
                              gid_from_isect, tile_ranges,
                              img_size, max_per_tile, chunk=32):
    """Non-differentiable helper: per-splat visibility mask [N] (1.0 where the
    splat actually contributed to any pixel — rasterize.rs:141-143 bwd_info)."""
    px, py = _tile_pixel_coords(img_size)
    gid, valid = _gather_tile_isects(gid_from_isect, tile_ranges, max_per_tile)
    xy_g = mean2d[gid]

    n_tiles, m = gid.shape
    steps = m // chunk

    def split(x):
        return x.reshape((n_tiles, steps, chunk) + x.shape[2:]).swapaxes(0, 1)

    def body(carry, inputs):
        t_in, done = carry
        xy_c, conic_c, opac_c, valid_c = inputs
        dx = px[:, None, :] - xy_c[..., 0:1]
        dy = py[:, None, :] - xy_c[..., 1:2]
        c00, c01, c11 = (conic_c[..., 0:1], conic_c[..., 1:2], conic_c[..., 2:3])
        sigma = 0.5 * (c00 * dx * dx + c11 * dy * dy) + c01 * dx * dy
        alpha = jnp.minimum(ALPHA_CAP, opac_c[..., None] * jnp.exp(-sigma))
        gate = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF_MID) & valid_c[..., None]
        a = jnp.where(gate, alpha, 0.0)
        one_minus = 1.0 - a
        cp = jnp.cumprod(one_minus, axis=1)
        s_incl = t_in[:, None, :] * cp
        blended = (s_incl > TRANSMITTANCE_EPS) & ~done[:, None, :]
        contributes = jnp.any(blended & (a > 0.0), axis=2)  # [T, CK]
        t_out = t_in * jnp.prod(jnp.where(blended, one_minus, 1.0), axis=1)
        done_out = done | jnp.any(s_incl <= TRANSMITTANCE_EPS, axis=1)
        return (t_out, done_out), contributes

    init = (jnp.ones((n_tiles, TILE_PIX), jnp.float32),
            jnp.zeros((n_tiles, TILE_PIX), bool))
    _, contrib_steps = jax.lax.scan(
        body, init, (split(xy_g), split(conic[gid]), split(opac[gid]), split(valid)))
    contrib = contrib_steps.swapaxes(0, 1).reshape(n_tiles, m)
    n = mean2d.shape[0]
    return jnp.zeros((n,), jnp.float32).at[gid].max(
        jnp.where(valid, contrib.astype(jnp.float32), 0.0))
