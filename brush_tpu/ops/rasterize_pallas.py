"""Production Pallas TPU rasterizer (forward).

The TPU-native counterpart of the reference's tile rasterizer
(brush-render/src/kernels/rasterize.rs). Same math as ops/rasterize_jnp.py
(the jnp spec/oracle), restructured for the TPU memory/compute model:

* One grid step per 16x16 tile. The tile's 256 pixels live on the *sublane*
  axis; a chunk of `CK` depth-ordered splats lives on the *lane* axis, so
  every elementwise op is a dense [256, CK] VPU op — the reference's
  per-thread splat loop (rasterize.rs:114-153) becomes data-parallel.
* The sequential per-pixel transmittance recurrence `T *= (1 - a)` becomes a
  multiplicative Hillis-Steele scan over the lane axis (log2(CK) roll+mul
  steps) giving all prefix transmittances at once; the per-pixel early-out
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

from brush_tpu.constants import (
    ALPHA_CUTOFF_MID,
    ALPHA_CAP,
    TILE_WIDTH,
    TRANSMITTANCE_EPS,
)

TILE_PIX = TILE_WIDTH * TILE_WIDTH  # 256
SOA_ROWS = 16
CK = 256  # splats per chunk; must be a power of two and multiple of 128


def _lane_iota(n_rows, n_lanes):
    return jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_lanes), 1)


def _exclusive_cumprod_lanes(x):
    """Exclusive multiplicative scan along the lane axis of [R, CK]."""
    rows, lanes = x.shape
    ids = _lane_iota(rows, lanes)
    # Shift right by one lane (fill 1.0) => exclusive.
    y = jnp.where(ids >= 1, pltpu.roll(x, 1, 1), 1.0)
    shift = 1
    while shift < lanes:
        y = y * jnp.where(ids >= shift, pltpu.roll(y, shift, 1), 1.0)
        shift *= 2
    return y


def _fwd_kernel(ranges_ref,            # scalar-prefetch [T, 2] int32 (SMEM)
                proj_ref,              # [16, I] f32 in ANY/HBM
                bg_ref,                # [1, 4] f32 SMEM: rgb + pad
                out_ref,               # [1, 8, 256] VMEM block per tile
                buf, sem,              # scratch: [2, 16, CK] VMEM, DMA sems (2,)
                *, tile_bw: int, isect_cap: int):
    t = pl.program_id(0)
    start = ranges_ref[t, 0]
    end = ranges_ref[t, 1]

    astart = (start // CK) * CK
    span = end - astart
    nchunks = jnp.where(span > 0, (span + CK - 1) // CK, 0)

    # Pixel-center coordinates for this tile: [256, 1] on sublanes.
    pix = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 1), 0)
    tx = t % tile_bw
    ty = t // tile_bw
    px = (tx * TILE_WIDTH + pix % TILE_WIDTH).astype(jnp.float32) + 0.5
    py = (ty * TILE_WIDTH + pix // TILE_WIDTH).astype(jnp.float32) + 0.5

    lane_ids = _lane_iota(1, CK)  # [1, CK]

    def dma(slot, chunk):
        off = astart + chunk * CK
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
        valid = (isect >= start) & (isect < end)

        dx = px - data[0:1, :]
        dy = py - data[1:2, :]
        sigma = (0.5 * (data[2:3, :] * dx * dx + data[4:5, :] * dy * dy)
                 + data[3:4, :] * dx * dy)
        alpha = jnp.minimum(ALPHA_CAP, data[5:6, :] * jnp.exp(-sigma))
        gate = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF_MID) & valid
        a = jnp.where(gate, alpha, 0.0)

        one_minus = 1.0 - a
        cp_excl = _exclusive_cumprod_lanes(one_minus)
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


def build_soa(mean2d, conic, color, opac, gid_from_isect):
    """Gather projected splats into intersection order as a [16, I] SoA."""
    fields = jnp.stack([
        mean2d[:, 0], mean2d[:, 1],
        conic[:, 0], conic[:, 1], conic[:, 2],
        opac,
        color[:, 0], color[:, 1], color[:, 2],
    ], axis=0)  # [9, N]
    soa = fields[:, gid_from_isect]  # [9, I]
    pad = jnp.zeros((SOA_ROWS - soa.shape[0], soa.shape[1]), soa.dtype)
    return jnp.concatenate([soa, pad], axis=0)


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
            pl.BlockSpec(memory_space=pltpu.ANY),   # proj soa (manual DMA)
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
    )(tile_ranges, soa, bg4)
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
