"""Production Pallas TPU rasterizer (forward).

The TPU-native counterpart of the reference's tile rasterizer
(brush-render/src/kernels/rasterize.rs). Same math as ops/rasterize_jnp.py
(the jnp spec/oracle), restructured for the TPU memory/compute model:

* One grid step per 16x16 tile. The tile's 256 pixels live on the *sublane*
  axis; a chunk of `CK` depth-ordered splats lives on the *lane* axis, so
  every elementwise op is a dense [256, CK] VPU op — the reference's
  per-thread splat loop (rasterize.rs:114-153) becomes data-parallel.
* The sequential per-pixel transmittance recurrence `T *= (1 - a)` becomes a
  log-space prefix over the lane axis, computed as ONE triangular matmul on
  the MXU (exp(log(1-a) @ tri)) instead of a log2(CK)-step roll+mul ladder,
  giving all prefix transmittances at once; the per-pixel early-out
  `next_T <= 1e-4` (rasterize.rs:138) becomes a monotone prefix test plus a
  carried `done` mask, and a whole-tile early exit ends the chunk loop when
  every pixel saturates (the shared-memory done counter of rasterize.rs:90).
* Projected splats are pre-gathered (XLA gather) into intersection order as
  a [16, I] SoA so each chunk is one dense, 256-aligned DMA from HBM —
  the cooperative shared-memory load of rasterize.rs:93-109. Double-buffered
  via manual async copies.
* Per-tile isect ranges arrive via scalar prefetch (SMEM) — the reference's
  tile_offsets buffer.
* Extra outputs per tile: final transmittance (for the backward) and
  `useful_end` — one past the last intersection any pixel consumed — the
  reference's tile-range shrinking for the backward pass (rasterize.rs:181-187).

SoA row layout (rows 0..8, rest padding):
  0: xy_x, 1: xy_y, 2: conic00, 3: conic01, 4: conic11, 5: alpha, 6..8: rgb.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import numpy as _np

from brush_tpu.constants import (
    ALPHA_CUTOFF_MID,
    ALPHA_CAP,
    REFINE_WEIGHT_CLAMP,
    SATURATED_ALPHA_GRAD_CUTOFF,
    TILE_WIDTH,
    TRANSMITTANCE_EPS,
)

TILE_PIX = TILE_WIDTH * TILE_WIDTH  # 256
SOA_ROWS = 16
CK = 256  # splats per chunk; must be a power of two and multiple of 128


def _lane_iota(n_rows, n_lanes):
    return jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_lanes), 1)


def _fwd_kernel(ranges_ref,            # scalar-prefetch [T*2] int32 (SMEM)
                proj_ref,              # [16, I] f32 in ANY/HBM
                bg_ref,                # [1, 4] f32 SMEM: rgb + pad
                out_ref,               # [1, 8, 256] VMEM block per tile
                buf, sem,              # scratch: [2, 16, CK] VMEM, DMA sems (2,)
                *, tile_bw: int, isect_cap: int):
    t = pl.program_id(0)
    # Ranges are flattened 1-D: 2-D int32 SMEM arrays get lane-padded to
    # x128, blowing the 1 MB SMEM budget at 1080p tile counts.
    start = ranges_ref[2 * t]
    end = ranges_ref[2 * t + 1]

    # Tile ranges are ALIGN(=CK)-aligned and own their full aligned span
    # (ops/tiling.py), so chunks never cross tile boundaries and padding
    # slots are inert (alpha == 0 in the SoA).
    astart = start
    span = end - astart
    nchunks = jnp.where(span > 0, (span + CK - 1) // CK, 0)

    # Pixel-center coordinates for this tile: [256, 1] on sublanes.
    pix = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 1), 0)
    tx = t % tile_bw
    ty = t // tile_bw
    px = (tx * TILE_WIDTH + pix % TILE_WIDTH).astype(jnp.float32) + 0.5
    py = (ty * TILE_WIDTH + pix // TILE_WIDTH).astype(jnp.float32) + 0.5

    lane_ids = _lane_iota(1, CK)  # [1, CK]
    tri_strict, _ = _tri_masks(CK)

    def dma(slot, chunk):
        # Tile starts are ALIGN(=CK)-aligned by construction (ops/tiling.py).
        off = pl.multiple_of(astart + chunk * CK, CK)
        return pltpu.make_async_copy(
            proj_ref.at[:, pl.ds(off, CK)], buf.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    # Per-pixel `done` rides in the sign of the carried transmittance: done
    # pixels carry -T. (A done pixel's frozen T stays > eps, so the prefix
    # test alone could wrongly re-admit later tiny alphas — the reference's
    # `done` flag is sticky, rasterize.rs:138-139.)
    def cond2(carry):
        c, rgb, t_acc, ndone, last_useful = carry
        return (c < nchunks) & (ndone < TILE_PIX)

    def body2(carry):
        c, rgb, t_acc_signed, ndone, last_useful = carry
        slot = c % 2

        @pl.when(c + 1 < nchunks)
        def _():
            dma(1 - slot, c + 1).start()

        dma(slot, c).wait()
        data = buf[slot]

        done_in = t_acc_signed < 0.0                            # [256, 1]
        t_acc = jnp.abs(t_acc_signed)

        isect = astart + c * CK + lane_ids

        dx = px - data[0:1, :]
        dy = py - data[1:2, :]
        sigma = (0.5 * (data[2:3, :] * dx * dx + data[4:5, :] * dy * dy)
                 + data[3:4, :] * dx * dy)
        alpha = jnp.minimum(ALPHA_CAP, data[5:6, :] * jnp.exp(-sigma))
        gate = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF_MID)
        a = jnp.where(gate, alpha, 0.0)

        one_minus = 1.0 - a
        # Exclusive lane cumprod via log-space MXU prefix (see _prefix_mxu);
        # alpha caps at 0.999 so log(one_minus) is finite.
        cp_excl = jnp.exp(_prefix_mxu(jnp.log(one_minus), tri_strict))
        s_excl = t_acc * cp_excl
        s_incl = s_excl * one_minus
        blended = (s_incl > TRANSMITTANCE_EPS) & ~done_in
        w = jnp.where(blended, a * s_excl, 0.0)

        cmax = jnp.maximum(data[6:9, :], 0.0)
        rgb = rgb + jax.lax.dot_general(
            w, cmax, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

        # Product over the blended prefix == its last inclusive transmittance
        # (s_incl is non-increasing over the prefix); reduce_prod has no
        # Pallas TPU lowering, min does.
        t_new = jnp.min(jnp.where(blended, s_incl, t_acc), axis=1,
                        keepdims=True)
        crossed = jnp.any((s_incl <= TRANSMITTANCE_EPS) & ~done_in,
                          axis=1, keepdims=True)
        done_out = done_in | crossed
        t_signed = jnp.where(done_out, -t_new, t_new)

        useful = jnp.max(jnp.where(
            jnp.any(blended & (a > 0.0), axis=0, keepdims=True),
            isect + 1, 0))
        last_useful = jnp.maximum(last_useful, useful)
        ndone = jnp.sum(done_out.astype(jnp.int32))

        return (c + 1, rgb, t_signed, ndone, last_useful)

    init2 = (
        jnp.asarray(0, jnp.int32),
        jnp.zeros((TILE_PIX, 3), jnp.float32),
        jnp.ones((TILE_PIX, 1), jnp.float32),
        jnp.asarray(0, jnp.int32),
        start,
    )
    c_fin, rgb, t_signed, _, last_useful = jax.lax.while_loop(
        cond2, body2, init2)
    t_final = jnp.abs(t_signed)                                 # [256, 1]

    # Early exit leaves the c_fin prefetch in flight; drain it so the DMA
    # semaphore carries no leftover signal into the next grid step.
    @pl.when(c_fin < nchunks)
    def _():
        dma(c_fin % 2, c_fin).wait()

    bg_r = bg_ref[0, 0]
    bg_g = bg_ref[0, 1]
    bg_b = bg_ref[0, 2]
    out_ref[0, 0, :] = rgb[:, 0] + t_final[:, 0] * bg_r
    out_ref[0, 1, :] = rgb[:, 1] + t_final[:, 0] * bg_g
    out_ref[0, 2, :] = rgb[:, 2] + t_final[:, 0] * bg_b
    out_ref[0, 3, :] = 1.0 - t_final[:, 0]
    out_ref[0, 4, :] = t_final[:, 0]
    # Row 5: useful range length for the backward pass (rasterize.rs:181-187
    # tile-range shrinking). Small enough to be exact in f32.
    useful_len = (jnp.maximum(last_useful, start) - start).astype(jnp.float32)
    out_ref[0, 5, :] = jnp.full((TILE_PIX,), 1.0, jnp.float32) * useful_len
    out_ref[0, 6, :] = jnp.zeros((TILE_PIX,), jnp.float32)
    out_ref[0, 7, :] = jnp.zeros((TILE_PIX,), jnp.float32)


def build_soa(mean2d, conic, color, opac, gid_from_isect, isect_valid):
    """Gather projected splats into intersection order as a [16, I] SoA.

    Alignment-padding slots (isect_valid False) index a trailing dummy
    all-zeros splat row (alpha 0 makes them inert in both the forward blend
    and the backward replay) — one padded-table gather instead of a gather
    plus a masked second write (TPU gathers are per-index-cost; ~2x faster).
    """
    n = opac.shape[0]
    fields = jnp.stack([
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opac,
        color[:, 0], color[:, 1], color[:, 2],
    ] + [jnp.zeros_like(opac)] * (SOA_ROWS - 9), axis=0)  # [16, N]
    fields = jnp.concatenate(
        [fields, jnp.zeros((SOA_ROWS, 1), fields.dtype)], axis=1)
    gid_safe = jnp.where(isect_valid, gid_from_isect, n)
    return fields[:, gid_safe]  # [16, I]


@functools.partial(jax.jit, static_argnames=("img_size", "interpret"))
def rasterize_forward_pallas(soa, tile_ranges, bg, img_size, interpret=False):
    """Rasterize [16, I] SoA intersections -> tile image [T, 8, 256].

    Tile rows: 0..2 rgb, 3 alpha, 4 final transmittance, 5 useful-range
    length (for the backward pass), 6..7 padding.
    """
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    n_tiles = tbw * tbh
    isect_cap = soa.shape[1]
    assert isect_cap % CK == 0, "isect capacity must be a multiple of 256"

    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1)]).reshape(1, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # proj soa (manual DMA)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bg
        ],
        out_specs=pl.BlockSpec((1, 8, TILE_PIX), lambda t, ranges: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, SOA_ROWS, CK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    kernel = functools.partial(_fwd_kernel, tile_bw=tbw, isect_cap=isect_cap)
    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 8, TILE_PIX), jnp.float32),
        interpret=interpret,
    )(tile_ranges.reshape(-1), soa, bg4)
    return tiles


def tiles_to_image(tiles, img_size):
    """[T, 8, 256] tile rows -> [H, W, 4] image."""
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    rgba = tiles[:, :4, :]  # [T, 4, 256]
    img = rgba.reshape(tbh, tbw, 4, TILE_WIDTH, TILE_WIDTH)
    img = img.transpose(0, 3, 1, 4, 2).reshape(
        tbh * TILE_WIDTH, tbw * TILE_WIDTH, 4)
    return img[:img_h, :img_w]


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------
#
# TPU-native counterpart of rasterize_backwards_kernel
# (brush-render-bwd/src/kernels/rasterize_backwards.rs). The reference replays
# the blend per tile with one SIMD lane per splat and accumulates the
# 10-component splat gradient via f32 atomics; TPUs have no atomics, so:
#
# * the replay is the same lane-parallel prefix-scan structure as the
#   forward, producing per-(splat, pixel) adjoints as dense [256, CK] ops;
# * per-intersection gradients (summed over the tile's pixels) are written
#   to an intersection-indexed SoA with plain DMA stores — race-free because
#   the aligned tile ranges never share a chunk (ops/tiling.py ALIGN);
# * the cross-tile reduction per splat happens outside the kernel as one
#   XLA scatter-add over gid_from_isect (SURVEY.md §2.1: "reduce with
#   segment_sum instead of atomics").
#
# The suffix color sums the reference tracks in shared memory
# (rasterize_backwards.rs pix_state) come for free here: for each pixel,
# R_rem = dot(pre_bg_rgb, v_rgb) initially, decremented chunk by chunk.
#
# Gradient SoA rows: 0 v_xy_x, 1 v_xy_y, 2..4 v_conic, 5 v_opac, 6..8 v_rgb,
# 9 refine weight (|v_xy*img| / max(final_a,1e-5), rasterize_backwards.rs:
# 369-375), 10 visibility (total blend weight > 0), rest padding.


def _tri_masks(n):
    """Triangular [n, n] f32 masks for MXU prefix scans: strict (j < k) and
    inclusive (j <= k)."""
    j = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    k = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (j < k).astype(jnp.float32), (j <= k).astype(jnp.float32)


def _prefix_mxu(x, tri):
    """Lane-axis prefix sum of [R, CK] as one triangular matmul on the MXU.

    The roll+add Hillis-Steele ladder costs log2(CK)=8 sequential
    (roll, select, add) VPU passes over the whole block; a [CK, CK]
    triangular contraction is one MXU op. With the strict mask this yields
    the EXCLUSIVE prefix, with the inclusive mask the inclusive one.
    """
    return jax.lax.dot_general(
        x, tri, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


def _bwd_kernel(ranges_ref,            # scalar-prefetch [T*2] int32
                proj_ref,              # [16, I] f32 ANY/HBM
                tiles_ref,             # [1, 8, 256] fwd output block (VMEM)
                vt_ref,                # [1, 8, 256] cotangent block (VMEM)
                bg_ref,                # [1, 4] f32 SMEM
                grads_ref,             # [16, I] f32 ANY/HBM (output)
                buf, sem, obuf, osem,  # scratch
                *, tile_bw: int, img_w: int, img_h: int):
    t = pl.program_id(0)
    start = ranges_ref[2 * t]
    end = ranges_ref[2 * t + 1]
    span = end - start
    nchunks = jnp.where(span > 0, (span + CK - 1) // CK, 0)

    pix = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 1), 0)
    tx = t % tile_bw
    ty = t // tile_bw
    px = (tx * TILE_WIDTH + pix % TILE_WIDTH).astype(jnp.float32) + 0.5
    py = (ty * TILE_WIDTH + pix // TILE_WIDTH).astype(jnp.float32) + 0.5

    # Per-pixel saved state / cotangents: transpose [8,256] -> [256,8] so
    # pixels ride the sublane axis like everything else.
    ft = tiles_ref[0].T        # [256, 8]: rgb, A, T, useful_len
    vt = vt_ref[0].T           # [256, 8]: v_rgb, v_A
    t_fin = ft[:, 4:5]
    final_a = ft[:, 3:4]
    bg_vec = jnp.array([[0.0]], jnp.float32)  # placeholder, scalars below
    bg_r = bg_ref[0, 0]
    bg_g = bg_ref[0, 1]
    bg_b = bg_ref[0, 2]
    v_rgb = vt[:, 0:3]                                     # [256, 3]
    v_a_out = vt[:, 3:4]
    pre_bg = ft[:, 0:3] - t_fin * jnp.concatenate(
        [jnp.full((TILE_PIX, 1), 1.0) * bg_r,
         jnp.full((TILE_PIX, 1), 1.0) * bg_g,
         jnp.full((TILE_PIX, 1), 1.0) * bg_b], axis=1)
    # dL/dT_final per pixel: bg.v_rgb - v_A (out_a = 1 - T).
    f_t = (v_rgb[:, 0:1] * bg_r + v_rgb[:, 1:2] * bg_g
           + v_rgb[:, 2:3] * bg_b - v_a_out)               # [256, 1]
    r_rem0 = jnp.sum(pre_bg * v_rgb, axis=1, keepdims=True)  # [256, 1]

    useful_len = ft[0, 5].astype(jnp.int32)
    nuseful = jnp.where(useful_len > 0, (useful_len + CK - 1) // CK, 0)

    inv_final_a = 1.0 / jnp.maximum(final_a, 1.0e-5)       # [256, 1]

    def in_dma(slot, chunk):
        off = pl.multiple_of(start + chunk * CK, CK)
        return pltpu.make_async_copy(
            proj_ref.at[:, pl.ds(off, CK)], buf.at[slot], sem.at[slot])

    def out_dma(slot, chunk):
        off = pl.multiple_of(start + chunk * CK, CK)
        return pltpu.make_async_copy(
            obuf.at[slot], grads_ref.at[:, pl.ds(off, CK)], osem.at[slot])

    @pl.when(nuseful > 0)
    def _():
        in_dma(0, 0).start()

    tri_strict, tri_incl = _tri_masks(CK)

    # The compute loop runs only to nuseful (the forward's shrunk useful
    # range, rasterize.rs:181-187); the [nuseful, nchunks) tail — splats the
    # saturated tile never consumed — is zero-FILLED with DMA-only stores
    # below, no VPU work (the gradient buffer must still be written: those
    # slots are valid-keyed in the sorted reduce).
    def cond(carry):
        return carry[0] < nuseful

    def body(carry):
        c, t_acc_signed, r_rem = carry
        slot = c % 2

        # Output double-buffer: before overwriting obuf[slot], drain the
        # store issued two chunks ago from this slot.
        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        @pl.when(c + 1 < nuseful)
        def _():
            in_dma(1 - slot, c + 1).start()
        in_dma(slot, c).wait()

        data = buf[slot]

        done_in = t_acc_signed < 0.0
        t_acc = jnp.abs(t_acc_signed)

        dx = px - data[0:1, :]
        dy = py - data[1:2, :]
        c00 = data[2:3, :]
        c01 = data[3:4, :]
        c11 = data[4:5, :]
        opa = data[5:6, :]
        sigma = 0.5 * (c00 * dx * dx + c11 * dy * dy) + c01 * dx * dy
        gauss = jnp.exp(-sigma)
        og = opa * gauss
        alpha = jnp.minimum(ALPHA_CAP, og)
        gate = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF_MID)
        a = jnp.where(gate, alpha, 0.0)

        one_minus = 1.0 - a
        # Exclusive lane cumprod in log space: alpha caps at 0.999 so
        # one_minus >= 1e-3 and the log is always finite; gated-out lanes
        # contribute log(1) = 0 exactly.
        cp_excl = jnp.exp(_prefix_mxu(jnp.log(one_minus), tri_strict))
        s_excl = t_acc * cp_excl
        s_incl = s_excl * one_minus
        blended = (s_incl > TRANSMITTANCE_EPS) & ~done_in
        w = jnp.where(blended, a * s_excl, 0.0)

        cmax = jnp.maximum(data[6:9, :], 0.0)              # [3, CK]
        # v_w[p, k] = cmax_k . v_rgb_p
        v_w = jax.lax.dot_general(
            v_rgb, cmax, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)            # [256, CK]

        g_contrib = w * v_w                                # [256, CK]
        prefix_incl = _prefix_mxu(g_contrib, tri_incl)
        r_after = r_rem - prefix_incl                      # [256, CK]

        ra = 1.0 / one_minus
        msk = blended & (a > 0.0)
        v_alpha = jnp.where(
            msk, s_excl * v_w - (r_after + t_fin * f_t) * ra, 0.0)

        unsat = og <= SATURATED_ALPHA_GRAD_CUTOFF
        mu = msk & unsat
        v_sigma = jnp.where(mu, -og * v_alpha, 0.0)
        gxy_x = -v_sigma * (c00 * dx + c01 * dy)           # [256, CK]
        gxy_y = -v_sigma * (c01 * dx + c11 * dy)

        # Per-intersection reductions over the tile's pixels.
        g_xy_x = jnp.sum(gxy_x, axis=0, keepdims=True)     # [1, CK]
        g_xy_y = jnp.sum(gxy_y, axis=0, keepdims=True)
        g_c00 = jnp.sum(0.5 * v_sigma * dx * dx, axis=0, keepdims=True)
        g_c01 = jnp.sum(v_sigma * dx * dy, axis=0, keepdims=True)
        g_c11 = jnp.sum(0.5 * v_sigma * dy * dy, axis=0, keepdims=True)
        g_opa = jnp.sum(jnp.where(mu, gauss * v_alpha, 0.0),
                        axis=0, keepdims=True)

        # v_color[c, k] = sum_p w[p,k] v_rgb[p,c], gated by color > 0
        # (the blend uses max(color, 0), rasterize.rs:145-147).
        v_col = jax.lax.dot_general(
            v_rgb, w, (((0,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)            # [3, CK]
        v_col = jnp.where(data[6:9, :] > 0.0, v_col, 0.0)

        refine = jnp.sum(
            jnp.sqrt((gxy_x * img_w) ** 2 + (gxy_y * img_h) ** 2)
            * inv_final_a, axis=0, keepdims=True)          # [1, CK]
        w_total = jnp.sum(w, axis=0, keepdims=True)        # [1, CK]

        zeros_like_lane = jnp.zeros((1, CK), jnp.float32)
        rows = [
            g_xy_x, g_xy_y, g_c00, g_c01, g_c11, g_opa,
            v_col[0:1], v_col[1:2], v_col[2:3],
            refine, w_total,
        ]
        grad_chunk = jnp.concatenate(
            rows + [zeros_like_lane] * (SOA_ROWS - len(rows)), axis=0)
        obuf[slot] = grad_chunk
        out_dma(slot, c).start()

        # Forward replay state update.
        t_new = jnp.min(jnp.where(blended, s_incl, t_acc), axis=1,
                        keepdims=True)
        crossed = jnp.any((s_incl <= TRANSMITTANCE_EPS) & ~done_in,
                          axis=1, keepdims=True)
        t_signed_new = jnp.where(done_in | crossed, -t_new, t_new)
        r_rem_new = r_rem - prefix_incl[:, CK - 1:CK]
        return (c + 1, t_signed_new, r_rem_new)

    init = (jnp.asarray(0, jnp.int32),
            jnp.ones((TILE_PIX, 1), jnp.float32), r_rem0)
    c_fin = jax.lax.while_loop(cond, body, init)[0]

    # Drain the compute-phase stores before touching obuf again.
    @pl.when(c_fin >= 2)
    def _():
        out_dma(c_fin % 2, c_fin - 2).wait()

    @pl.when(c_fin >= 1)
    def _():
        out_dma((c_fin - 1) % 2, c_fin - 1).wait()

    # Zero-fill [nuseful, nchunks): DMA-only stores of a zeroed buffer.
    @pl.when(c_fin < nchunks)
    def _():
        obuf[0] = jnp.zeros((SOA_ROWS, CK), jnp.float32)
        obuf[1] = jnp.zeros((SOA_ROWS, CK), jnp.float32)

        def fill(c, _):
            slot = c % 2

            @pl.when(c >= c_fin + 2)
            def _():
                out_dma(slot, c - 2).wait()

            out_dma(slot, c).start()
            return 0

        jax.lax.fori_loop(c_fin, nchunks, fill, 0)
        nrem = nchunks - c_fin

        @pl.when(nrem >= 2)
        def _():
            out_dma(nchunks % 2, nchunks - 2).wait()

        @pl.when(nrem >= 1)
        def _():
            out_dma((nchunks - 1) % 2, nchunks - 1).wait()


@functools.partial(jax.jit,
                   static_argnames=("img_size", "interpret"))
def rasterize_backward_pallas(soa, tile_ranges, tiles, v_tiles, bg, img_size,
                              interpret=False):
    """Per-intersection gradient SoA [16, I] from image cotangents."""
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    n_tiles = tbw * tbh
    isect_cap = soa.shape[1]

    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1)]).reshape(1, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # proj soa
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, ranges: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # fwd tiles
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, ranges: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # cotangent tiles
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bg
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, SOA_ROWS, CK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((2, SOA_ROWS, CK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, tile_bw=tbw,
                               img_w=img_w, img_h=img_h)
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SOA_ROWS, isect_cap), jnp.float32),
        interpret=interpret,
    )(tile_ranges.reshape(-1), soa, tiles, v_tiles, bg4)
    return grads


def image_to_tiles(img, img_size):
    """[H, W, C] -> [T, 8, 256] tile layout (rows past C zero-padded)."""
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    c = img.shape[-1]
    padded = jnp.zeros((tbh * TILE_WIDTH, tbw * TILE_WIDTH, 8), img.dtype)
    padded = padded.at[:img_h, :img_w, :c].set(img)
    tiles = padded.reshape(tbh, TILE_WIDTH, tbw, TILE_WIDTH, 8)
    return tiles.transpose(0, 2, 4, 1, 3).reshape(
        tbh * tbw, 8, TILE_PIX)


def _cumsum_flat_rows(x):
    """Inclusive prefix sum along axis 1. On TPU: the Pallas carry-scan
    kernel (one HBM pass; the shift+add ladder costs ~900 ms at [11, 8M]).
    On CPU (tests): the ladder (associative_scan's recursive form compiles
    pathologically even at test sizes)."""
    if jax.default_backend() != "cpu":
        from brush_tpu.ops.scan_pallas import cumsum_rows
        return cumsum_rows(x)
    n = x.shape[1]
    s = 1
    while s < n:
        shifted = jnp.concatenate(
            [jnp.zeros((x.shape[0], s), x.dtype), x[:, :-s]], axis=1)
        x = x + shifted
        s *= 2
    return x


def _reduce_grads_sorted(g, gid_from_isect, isect_valid, surv_starts_g,
                         surv_counts_g):
    """Per-splat gradient reduction -> [N, C] in GLOBAL splat order.

    The reference accumulates with f32 atomics (rasterize_backwards.rs
    HfAtomicAdd); TPU has none. A stable multi-payload sort by global gid
    brings every splat's per-intersection gradients into one contiguous run
    (89 ms at 8M slots — the scatter+gather expansion-order routing this
    replaces measured 249 ms: XLA gathers/scatters cost ~7-24 ns *per
    index*, while sort payloads move at near-bandwidth), and the segment
    boundaries in sorted order are already known analytically: the tiling
    pass counts each splat's surviving slots (Intersections.surv_*_g), so
    the reduce is one Pallas carry-scan cumsum plus a boundary difference —
    no boundary extraction, and the result lands directly in global splat
    order (no inverse-permutation gather).
    """
    c, i_cap = g.shape
    n = surv_starts_g.shape[0]
    key = jnp.where(isect_valid, gid_from_isect, n)
    sorted_ops = jax.lax.sort(
        (key,) + tuple(g[i] for i in range(c)), num_keys=1, is_stable=True)
    g_sorted = jnp.stack(sorted_ops[1:], axis=0)        # [C, I] gid-major
    cs = _cumsum_flat_rows(g_sorted)                    # [C, I]
    csp = jnp.concatenate([jnp.zeros((c, 1), cs.dtype), cs], axis=1)
    idx_lo = jnp.clip(surv_starts_g, 0, i_cap)
    idx_hi = jnp.clip(surv_starts_g + surv_counts_g, 0, i_cap)
    return (csp[:, idx_hi] - csp[:, idx_lo]).T          # [N, C] global order


def _use_interpret():
    import jax as _jax
    return _jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(12,))
def rasterize_pallas(mean2d, conic, color, opac, refine_holder,
                     visible_holder, gid_from_isect, isect_valid,
                     tile_ranges, surv_starts_g, surv_counts_g,
                     bg, img_size):
    """Production rasterize: [H, W, 4] image via the Pallas kernels.

    Differentiable w.r.t. mean2d/conic/color/opac/bg; `refine_holder` and
    `visible_holder` are zeros-[N] dummies whose cotangents carry the
    densify refine weight and the contributed-visibility mask (the
    reference's refine_weight_holder + `visible` buffer,
    brush-render-bwd/src/burn_glue.rs:252,269; rasterize.rs:141-143).
    `surv_starts_g`/`surv_counts_g` (Intersections fields) drive the
    backward's sorted-order gradient reduction.
    """
    img, _, _ = _rasterize_pallas_fwd_impl(
        mean2d, conic, color, opac, gid_from_isect, isect_valid,
        tile_ranges, bg, img_size)
    return img


def _rasterize_pallas_fwd_impl(mean2d, conic, color, opac, gid_from_isect,
                               isect_valid, tile_ranges, bg, img_size):
    soa = build_soa(mean2d, conic, color, opac, gid_from_isect, isect_valid)
    tiles = rasterize_forward_pallas(soa, tile_ranges, bg, img_size,
                                     interpret=_use_interpret())
    return tiles_to_image(tiles, img_size), soa, tiles


def _rasterize_pallas_fwd(mean2d, conic, color, opac, refine_holder,
                          visible_holder, gid_from_isect, isect_valid,
                          tile_ranges, surv_starts_g, surv_counts_g,
                          bg, img_size):
    img, soa, tiles = _rasterize_pallas_fwd_impl(
        mean2d, conic, color, opac, gid_from_isect, isect_valid,
        tile_ranges, bg, img_size)
    res = (soa, tiles, color, gid_from_isect, isect_valid, tile_ranges,
           surv_starts_g, surv_counts_g, bg, mean2d.shape[0])
    return img, res


def _rasterize_pallas_bwd(img_size, res, v_img):
    (soa, tiles, color, gid_from_isect, isect_valid, tile_ranges,
     surv_starts_g, surv_counts_g, bg, n) = res

    v_tiles = image_to_tiles(v_img, img_size)
    grads_soa = rasterize_backward_pallas(
        soa, tile_ranges, tiles, v_tiles, bg, img_size,
        interpret=_use_interpret())

    # The sorted-order reduce keys padding slots (isect_valid False) past
    # every real gid, so whatever the kernel left in never-written
    # sentinel-region slots sorts to the tail and is never summed.
    per_splat = _reduce_grads_sorted(
        grads_soa[:11], gid_from_isect, isect_valid,
        surv_starts_g, surv_counts_g)                               # [n,11]

    v_mean2d = per_splat[:, 0:2]
    v_conic = per_splat[:, 2:5]
    v_opac = per_splat[:, 5]
    v_color = per_splat[:, 6:9]
    v_refine = jnp.clip(jnp.nan_to_num(per_splat[:, 9], nan=0.0), 0.0,
                        REFINE_WEIGHT_CLAMP)
    v_visible = (per_splat[:, 10] > 0.0).astype(jnp.float32)

    # v_bg = sum_p T_p * v_rgb_p over real pixels (tiles carry T in row 4).
    img_w, img_h = img_size
    t_img = tiles_to_image(tiles, img_size)  # rgba; need T: recompute
    t_map = 1.0 - t_img[..., 3]
    v_bg = jnp.einsum("hw,hwc->c", t_map, v_img[..., :3],
                      precision=jax.lax.Precision.HIGHEST)

    zero_int = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
    return (v_mean2d, v_conic, v_color, v_opac, v_refine, v_visible,
            zero_int(gid_from_isect), zero_int(isect_valid),
            zero_int(tile_ranges), zero_int(surv_starts_g),
            zero_int(surv_counts_g), v_bg)


rasterize_pallas.defvjp(_rasterize_pallas_fwd, _rasterize_pallas_bwd)
