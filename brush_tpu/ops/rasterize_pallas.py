"""Production Pallas TPU rasterizer (forward + backward).

The TPU-native counterpart of the reference's tile rasterizers
(brush-render/src/kernels/rasterize.rs, brush-render-bwd/src/kernels/
rasterize_backwards.rs). Same math as ops/rasterize_jnp.py (the jnp
spec/oracle), restructured for the TPU memory/compute model:

* One grid step per 16x16 tile. The tile's 256 pixels live on the *sublane*
  axis; a chunk of `CK` depth-ordered splats lives on the *lane* axis, so
  every elementwise op is a dense [256, CK] VPU op — the reference's
  per-thread splat loop (rasterize.rs:114-153) becomes data-parallel.
* The per-slot splat attributes arrive as a [16, S] SoA built by the tile
  sort itself (sort payloads, ops/tiling.py) — there is no per-slot gather
  or relayout anywhere. Tile ranges are raw compact [start, end): chunk
  reads use an aligned-down DMA window plus one dynamic lane roll
  (Mosaic requires DMA offsets divisible by the 128-lane tiling), and
  out-of-range lanes are masked explicitly.
* The sequential per-pixel transmittance recurrence `T *= (1 - a)` becomes a
  log-space prefix over the lane axis, computed as ONE triangular matmul on
  the MXU (exp(log(1-a) @ tri)) instead of a log2(CK)-step roll+mul ladder,
  giving all prefix transmittances at once; the per-pixel early-out
  `next_T <= 1e-4` (rasterize.rs:138) becomes a monotone prefix test plus a
  carried `done` mask, and a whole-tile early exit ends the chunk loop when
  every pixel saturates (the shared-memory done counter of rasterize.rs:90).
* The backward writes per-chunk gradient blocks to a CHUNK-INDEXED
  lane-major buffer [16, chunk_cap*CK] — chunk c's block occupies lanes
  [c*CK, (c+1)*CK), a 256-multiple offset that satisfies Mosaic's 128-lane
  DMA alignment for free, and chunk columns are uniquely owned, so the
  stores are race-free (TPU has no atomics; the reference uses f32 atomic adds,
  rasterize_backwards.rs HfAtomicAdd). A gid key row rides in the block so
  the per-splat reduction is a stable sort by gid + one Pallas carry-scan
  cumsum + a boundary difference at analytically-known segment starts.
* Extra outputs per tile: final transmittance (for the backward) and
  `useful_end` — one past the last intersection any pixel consumed — the
  reference's tile-range shrinking for the backward pass (rasterize.rs:181-187).

SoA row layout (ops/tiling.py): 0 xy_x, 1 xy_y, 2 conic00, 3 conic01,
4 conic11, 5 alpha, 6..8 rgb, 9 gid, rest padding. Gradient-block rows:
0 v_xy_x, 1 v_xy_y, 2..4 v_conic, 5 v_opac, 6..8 v_rgb, 9 refine weight
(|v_xy*img| / max(final_a,1e-5), rasterize_backwards.rs:369-375),
10 visibility weight, 11 gid key.
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
from brush_tpu.ops.tiling import CK, DIET_SOA_ROWS, SOA_ROWS

TILE_PIX = TILE_WIDTH * TILE_WIDTH  # 1024
W = CK + 128                        # DMA window: chunk + roll slack
QPIX = 256                          # backward pixel sub-block (VMEM budget)
Q_SUB = TILE_PIX // QPIX
TPG = 4                             # tiles per forward grid step


def _lane_iota(n_rows, n_lanes):
    return jax.lax.broadcasted_iota(jnp.int32, (n_rows, n_lanes), 1)


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

    Precision: `tri` is 0/1 — EXACT in bf16 — so splitting `x` into three
    bf16 limbs (hi+mid+lo == x exactly; every limb x {0,1} product is
    exact; f32 accumulation) reproduces the f32 contraction in THREE MXU
    passes. Precision.HIGHEST would spend six passes on limb cross-terms
    of an operand that has no low limbs — this was the single largest MXU
    cost in both rasterizer kernels (~200 MFLOP-bf16 per chunk).
    """
    hi = x.astype(jnp.bfloat16)
    rem = x - hi.astype(jnp.float32)
    mid = rem.astype(jnp.bfloat16)
    lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    t16 = tri.astype(jnp.bfloat16)
    dims = (((1,), (0,)), ((), ()))
    out = jax.lax.dot_general(hi, t16, dims,
                              preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(mid, t16, dims,
                                    preferred_element_type=jnp.float32)
    out = out + jax.lax.dot_general(lo, t16, dims,
                                    preferred_element_type=jnp.float32)
    return out


def _window(buf_slot, r):
    """Rolled view of a [16, W] DMA window: lanes [0, CK) = the chunk."""
    shift = jax.lax.rem(W - r, W)  # r == 0 must roll by 0, not W
    return pltpu.roll(buf_slot, shift, 1)[:, :CK]


def _f16_to_f32(u):
    """Bit-exact equivalent of XLA's f16 -> f32 widening for f16 bit
    patterns held in the LOW 16 bits of an int32 (normals, subnormals,
    zeros, inf; f16 NaN never occurs — finite f32 inputs overflow to inf).
    Lets the diet SoA's u16 pairs decode in-kernel to exactly the values
    the unpacked pipeline would have carried."""
    s = (u >> 15) & 1
    e = (u >> 10) & 0x1F
    m = u & 0x3FF
    bits = (s << 31) | jnp.where(e == 31, (255 << 23) | (m << 13),
                                 ((e + 112) << 23) | (m << 13))
    val = pltpu.bitcast(bits, jnp.float32)
    # subnormal/zero (e == 0): value = +-m * 2^-24, exact in f32
    sub = jnp.where(s == 1, -1.0, 1.0) * (m.astype(jnp.float32)
                                          * jnp.float32(2.0 ** -24))
    return jnp.where(e == 0, sub, val)


def _decode_diet(data):
    """[DIET rows, CK] diet rows (pack_fwd_rows layout: 2 f32 xy +
    4 u16-pair) -> the 9 rasterizer rows [9, CK]: xy (tile-relative),
    conic, opac, rgb."""
    u = pltpu.bitcast(data[2:6], jnp.int32)
    lo = _f16_to_f32(u & 0xFFFF)
    hi = _f16_to_f32((u >> 16) & 0xFFFF)
    # rows: 0 mx, 1 my (f32), 2 (c00, c01), 3 (c11, opac), 4 (r, g), 5 (b, _)
    return jnp.concatenate([
        data[0:1], data[1:2], lo[0:1], hi[0:1], lo[1:2], hi[1:2],
        lo[2:3], hi[2:3], lo[3:4],
    ], axis=0)


def _fwd_kernel(ranges_ref,            # scalar-prefetch [T_pad*2] int32 (SMEM)
                soa_ref,               # [16|8, S+pad] f32 in ANY/HBM
                bg_ref,                # [1, 4] f32 SMEM: rgb + pad
                out_ref,               # [TPG, 8|4, 256] VMEM block per step
                buf, sem,              # scratch: [4, rows, W] VMEM, DMA sems
                *, tile_bw: int, n_tiles: int, fwd_only: bool,
                xtile: bool = True, tpg: int = 1):
    s_id = pl.program_id(0)

    lane_ids = _lane_iota(1, CK)  # [1, CK]
    tri_strict, _ = _tri_masks(CK)
    pix = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 1), 0)

    def first_dma(slot, tt):
        s2 = ranges_ref[2 * tt]
        al2 = (s2 // 128) * 128
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(pl.multiple_of(al2, 128), W)],
            buf.at[slot], sem.at[slot])

    # The grid carries a per-step floor (~several us with manual DMAs), so
    # each step rasterizes `tpg` consecutive tiles; the trailing partial
    # step pads with span-0 tiles (ranges padded host-side).
    for ti in range(tpg):
        t = s_id * tpg + ti
        # Ranges are flattened 1-D: 2-D int32 SMEM arrays get lane-padded
        # to x128, blowing the 1 MB SMEM budget at 1080p tile counts.
        start = ranges_ref[2 * t]
        end = ranges_ref[2 * t + 1]
        span = end - start
        nchunks = jnp.where(span > 0, (span + CK - 1) // CK, 0)
        al = (start // 128) * 128
        r = start - al

        # Cross-tile pipelining: manual DMAs don't overlap across grid
        # steps, so tile t's FIRST chunk would expose its full HBM latency
        # every tile (~8k tiles/frame). Instead each tile prefetches the
        # next tile's first chunk into a parity slot (2 + t%2) while it
        # computes; tile 0 pays the latency once. Slots 0/1 stay the
        # intra-tile double buffer. `xtile=False` (smoke-test A/B only)
        # disables the cross-tile prefetch: chunk 0 rides the plain double
        # buffer, numerically identical by construction, just
        # latency-exposed. SMOKE_r05's deep-wall addendum runs both.
        p_slot = 2 + jax.lax.rem(t, 2)

        if xtile:
            @pl.when((t == 0) & (nchunks > 0))
            def _():
                first_dma(p_slot, t).start()

            @pl.when(t + 1 < n_tiles)
            def _():
                nspan = ranges_ref[2 * t + 3] - ranges_ref[2 * t + 2]

                @pl.when(nspan > 0)
                def _():
                    first_dma(2 + jax.lax.rem(t + 1, 2), t + 1).start()

        # Pixel-center coordinates for this tile: [256, 1] on sublanes.
        # The diet path works tile-RELATIVE (pack_fwd_rows stores xy
        # relative to the slot's emission tile == this tile):
        # (px_abs - mx_abs) and (px_rel - mx_rel) round identically in f32
        # because the tile origin is an exact small integer in both
        # reconstructions.
        if fwd_only:
            px = (pix % TILE_WIDTH).astype(jnp.float32) + 0.5
            py = (pix // TILE_WIDTH).astype(jnp.float32) + 0.5
        else:
            tx = t % tile_bw
            ty = t // tile_bw
            px = (tx * TILE_WIDTH + pix % TILE_WIDTH
                  ).astype(jnp.float32) + 0.5
            py = (ty * TILE_WIDTH + pix // TILE_WIDTH
                  ).astype(jnp.float32) + 0.5

        def dma(slot, chunk, al=al):
            off = pl.multiple_of(al + chunk * CK, 128)
            return pltpu.make_async_copy(
                soa_ref.at[:, pl.ds(off, W)], buf.at[slot], sem.at[slot])

        # Per-pixel `done` rides in the sign of the carried transmittance:
        # done pixels carry -T. (A done pixel's frozen T stays > eps, so
        # the prefix test alone could wrongly re-admit later tiny alphas —
        # the reference's `done` flag is sticky, rasterize.rs:138-139.)
        def cond2(carry):
            c, rgb, t_acc, ndone, last_useful = carry
            return (c < nchunks) & (ndone < TILE_PIX)

        def body2(carry, nchunks=nchunks, p_slot=p_slot, dma=dma, r=r,
                  start=start, span=span, px=px, py=py):
            c, rgb, t_acc_signed, ndone, last_useful = carry
            # Chunk 0 arrives in the cross-tile prefetch slot; chunks >= 1
            # use the intra-tile double buffer. dma(p_slot, 0) reconstructs
            # the exact descriptor first_dma started (al + 0 == al2).
            if xtile:
                slot = jnp.where(c == 0, p_slot, jax.lax.rem(c, 2))
            else:
                slot = jax.lax.rem(c, 2)

                @pl.when(c == 0)
                def _():
                    dma(0, 0).start()

            @pl.when(c + 1 < nchunks)
            def _():
                dma(jax.lax.rem(c + 1, 2), c + 1).start()

            dma(slot, c).wait()
            data = _window(buf[slot], r)
            if fwd_only:
                data = _decode_diet(data)

            done_in = t_acc_signed < 0.0                        # [256, 1]
            t_acc = jnp.abs(t_acc_signed)

            isect = start + c * CK + lane_ids
            in_span = lane_ids < (span - c * CK)                # [1, CK]

            # (A round-5 experiment moved sigma onto the MXU as a
            # [pixels, 8] x [8, slots] basis matmul — reverted: the
            # contraction dim of 8 pads to the MXU's 128, wasting 16x,
            # and measured SLOWER than the VPU form on v5e.)
            dx = px - data[0:1, :]
            dy = py - data[1:2, :]
            sigma = (0.5 * (data[2:3, :] * dx * dx
                            + data[4:5, :] * dy * dy)
                     + data[3:4, :] * dx * dy)
            alpha = jnp.minimum(ALPHA_CAP, data[5:6, :] * jnp.exp(-sigma))
            gate = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF_MID) & in_span
            a = jnp.where(gate, alpha, 0.0)

            one_minus = 1.0 - a
            # Exclusive lane cumprod via log-space MXU prefix
            # (_prefix_mxu); alpha caps at 0.999 so log stays finite.
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

            # Product over the blended prefix == its last inclusive
            # transmittance (s_incl is non-increasing over the prefix);
            # reduce_prod has no Pallas TPU lowering, min does.
            t_new = jnp.min(jnp.where(blended, s_incl, t_acc), axis=1,
                            keepdims=True)
            crossed = jnp.any((s_incl <= TRANSMITTANCE_EPS) & ~done_in,
                              axis=1, keepdims=True)
            done_out = done_in | crossed
            t_signed = jnp.where(done_out, -t_new, t_new)

            if not fwd_only:
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
        t_final = jnp.abs(t_signed)                             # [256, 1]

        # Early exit leaves the c_fin prefetch in flight; drain it so the
        # DMA semaphore carries no leftover signal into the next tile.
        @pl.when(c_fin < nchunks)
        def _():
            dma(c_fin % 2, c_fin).wait()

        bg_r = bg_ref[0, 0]
        bg_g = bg_ref[0, 1]
        bg_b = bg_ref[0, 2]
        out_ref[ti, 0, :] = rgb[:, 0] + t_final[:, 0] * bg_r
        out_ref[ti, 1, :] = rgb[:, 1] + t_final[:, 0] * bg_g
        out_ref[ti, 2, :] = rgb[:, 2] + t_final[:, 0] * bg_b
        out_ref[ti, 3, :] = 1.0 - t_final[:, 0]
        if not fwd_only:
            out_ref[ti, 4, :] = t_final[:, 0]
            # Row 5: useful range length for the backward pass
            # (rasterize.rs:181-187 tile-range shrinking). Exact in f32.
            useful_len = (jnp.maximum(last_useful, start)
                          - start).astype(jnp.float32)
            out_ref[ti, 5, :] = (jnp.full((TILE_PIX,), 1.0, jnp.float32)
                                 * useful_len)
            out_ref[ti, 6, :] = jnp.zeros((TILE_PIX,), jnp.float32)
            out_ref[ti, 7, :] = jnp.zeros((TILE_PIX,), jnp.float32)


@functools.partial(jax.jit,
                   static_argnames=("img_size", "interpret", "fwd_only",
                                    "xtile_prefetch"))
def rasterize_forward_pallas(soa, tile_ranges, bg, img_size, interpret=False,
                             fwd_only=False, xtile_prefetch=True):
    """Rasterize the sorted SoA -> tile image [T, R, TILE_PIX].

    Tile rows: 0..2 rgb, 3 alpha, and (training variant only) 4 final
    transmittance, 5 useful-range length (for the backward pass), 6..7
    padding. `fwd_only=True` is the reference's inference specialization
    (rasterize.rs:172-177 comptime `bwd_info=false`): R=4, no backward
    bookkeeping computed or written, and `soa` is the DIET layout
    ([DIET_SOA_ROWS, S+pad] undecoded u16-pair rows, tiling.py) decoded
    in-kernel; the training variant takes the full [16, S+pad] SoA.
    """
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    n_tiles = tbw * tbh
    n_rows = 4 if fwd_only else 8
    soa_rows = DIET_SOA_ROWS if fwd_only else SOA_ROWS
    # Tiles per grid step: amortizes the per-grid-step floor (~several us
    # with manual DMAs) across TPG tiles; the trailing partial step reads
    # span-0 padded ranges and writes garbage tiles past n_tiles that
    # tiles_to_image never reads.
    tpg = TPG
    t_pad = -(-n_tiles // tpg) * tpg

    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1)]).reshape(1, 4)
    ranges_flat = jnp.pad(tile_ranges.reshape(-1),
                          (0, (t_pad - n_tiles) * 2))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(t_pad // tpg,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # soa (manual DMA)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bg
        ],
        out_specs=pl.BlockSpec((tpg, n_rows, TILE_PIX),
                               lambda s, ranges: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, soa_rows, W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )

    kernel = functools.partial(_fwd_kernel, tile_bw=tbw, n_tiles=n_tiles,
                               fwd_only=fwd_only, xtile=xtile_prefetch,
                               tpg=tpg)
    tiles = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t_pad, n_rows, TILE_PIX),
                                       jnp.float32),
        interpret=interpret,
    )(ranges_flat, soa, bg4)
    return tiles[:n_tiles]


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


def _bwd_kernel(ranges_ref,            # scalar-prefetch [T*2] int32
                chunkb_ref,            # scalar-prefetch [T] int32 chunk base
                soa_ref,               # [16, S+pad] f32 ANY/HBM
                tiles_ref,             # [1, 8, 256] fwd output block (VMEM)
                vt_ref,                # [1, 8, 256] cotangent block (VMEM)
                bg_ref,                # [1, 4] f32 SMEM
                grads_ref,             # [16, chunk_cap*CK] f32 ANY (output)
                buf, sem, obuf, osem,  # scratch
                *, img_w: int, img_h: int, n_splats: int, chunk_cap: int):
    t = pl.program_id(0)
    start = ranges_ref[2 * t]
    end = ranges_ref[2 * t + 1]
    span = end - start
    nchunks = jnp.where(span > 0, (span + CK - 1) // CK, 0)
    al = (start // 128) * 128
    r = start - al
    base = chunkb_ref[t]

    pix = jax.lax.broadcasted_iota(jnp.int32, (TILE_PIX, 1), 0)
    tile_bw = -(-img_w // TILE_WIDTH)
    tx = t % tile_bw
    ty = t // tile_bw
    px = (tx * TILE_WIDTH + pix % TILE_WIDTH).astype(jnp.float32) + 0.5
    py = (ty * TILE_WIDTH + pix // TILE_WIDTH).astype(jnp.float32) + 0.5

    lane_ids = _lane_iota(1, CK)
    tri_strict, tri_incl = _tri_masks(CK)

    # Per-pixel saved state / cotangents: transpose [8,256] -> [256,8] so
    # pixels ride the sublane axis like everything else.
    ft = tiles_ref[0].T        # [256, 8]: rgb, A, T, useful_len
    vt = vt_ref[0].T           # [256, 8]: v_rgb, v_A
    t_fin = ft[:, 4:5]
    final_a = ft[:, 3:4]
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
        off = pl.multiple_of(al + chunk * CK, 128)
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(off, W)], buf.at[slot], sem.at[slot])

    def out_dma(slot, chunk):
        # Lane-major gradient buffer [16, chunk_cap*CK]: chunk lane offsets
        # are multiples of CK=256, satisfying Mosaic's 128-lane DMA
        # alignment, and the reduce consumes this layout with NO transpose.
        row = jnp.clip(base + chunk, 0, chunk_cap - 1)
        off = pl.multiple_of(row * CK, CK)
        return pltpu.make_async_copy(
            obuf.at[slot], grads_ref.at[:, pl.ds(off, CK)], osem.at[slot])

    # Cross-tile pipelining (see _fwd_kernel): tile t's first chunk was
    # prefetched by tile t-1 into parity slot 2 + t%2; prefetch t+1's here.
    n_tiles = (-(-img_w // TILE_WIDTH)) * (-(-img_h // TILE_WIDTH))
    p_slot = 2 + jax.lax.rem(t, 2)

    def first_dma(slot, tt):
        s2 = ranges_ref[2 * tt]
        al2 = (s2 // 128) * 128
        return pltpu.make_async_copy(
            soa_ref.at[:, pl.ds(pl.multiple_of(al2, 128), W)],
            buf.at[slot], sem.at[slot])

    @pl.when((t == 0) & (nchunks > 0))
    def _():
        first_dma(p_slot, t).start()

    @pl.when(t + 1 < n_tiles)
    def _():
        nspan = ranges_ref[2 * t + 3] - ranges_ref[2 * t + 2]

        @pl.when(nspan > 0)
        def _():
            first_dma(2 + jax.lax.rem(t + 1, 2), t + 1).start()

    def key_row(data, c):
        in_span = (lane_ids < (span - c * CK)).astype(jnp.float32)
        return (in_span * data[9:10, :]
                + (1.0 - in_span) * jnp.float32(n_splats))

    # Compute loop runs only to nuseful (the forward's shrunk useful range,
    # rasterize.rs:181-187); the [nuseful, nchunks) tail — splats the
    # saturated tile never consumed — still gets zero gradients WITH a
    # correct gid key row below (those slots are counted in the per-splat
    # segment boundaries, so the key must be real).
    def cond(carry):
        return carry[0] < nuseful

    def body(carry):
        c, t_acc_signed, r_rem = carry
        slot = c % 2  # output double-buffer parity

        # Output double-buffer: before overwriting obuf[slot], drain the
        # store issued two chunks ago from this slot.
        @pl.when(c >= 2)
        def _():
            out_dma(slot, c - 2).wait()

        @pl.when(c + 1 < nchunks)
        def _():
            in_dma(jax.lax.rem(c + 1, 2), c + 1).start()
        rslot = jnp.where(c == 0, p_slot, jax.lax.rem(c, 2))
        in_dma(rslot, c).wait()

        data = _window(buf[rslot], r)

        in_span = lane_ids < (span - c * CK)
        c00 = data[2:3, :]
        c01 = data[3:4, :]
        c11 = data[4:5, :]
        opa = data[5:6, :]
        cmax = jnp.maximum(data[6:9, :], 0.0)              # [3, CK]

        # The 32x32 tile's pixels are processed as Q sequential sub-blocks
        # of QPIX=256: one [1024, CK] block needs ~26 MB of live VMEM
        # intermediates (over the 16 MB budget); the per-intersection
        # gradient rows are sums over pixels, so sub-blocks just accumulate.
        zero_lane = jnp.zeros((1, CK), jnp.float32)
        g_xy_x = g_xy_y = g_c00 = g_c01 = g_c11 = g_opa = zero_lane
        g_col0 = g_col1 = g_col2 = refine = w_total = zero_lane
        t_new_qs = []
        r_rem_qs = []
        for q in range(Q_SUB):
            sl = slice(q * QPIX, (q + 1) * QPIX)
            done_in = t_acc_signed[sl] < 0.0
            t_acc = jnp.abs(t_acc_signed[sl])
            r_rem_q = r_rem[sl]

            dx = px[sl] - data[0:1, :]
            dy = py[sl] - data[1:2, :]
            sigma = 0.5 * (c00 * dx * dx + c11 * dy * dy) + c01 * dx * dy
            gauss = jnp.exp(-sigma)
            og = opa * gauss
            alpha = jnp.minimum(ALPHA_CAP, og)
            gate = (sigma >= 0.0) & (alpha >= ALPHA_CUTOFF_MID) & in_span
            a = jnp.where(gate, alpha, 0.0)

            one_minus = 1.0 - a
            cp_excl = jnp.exp(_prefix_mxu(jnp.log(one_minus), tri_strict))
            s_excl = t_acc * cp_excl
            s_incl = s_excl * one_minus
            blended = (s_incl > TRANSMITTANCE_EPS) & ~done_in
            w = jnp.where(blended, a * s_excl, 0.0)

            # v_w[p, k] = cmax_k . v_rgb_p
            v_w = jax.lax.dot_general(
                v_rgb[sl], cmax, (((1,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # [QPIX, CK]

            g_contrib = w * v_w                            # [QPIX, CK]
            prefix_incl = _prefix_mxu(g_contrib, tri_incl)
            r_after = r_rem_q - prefix_incl                # [QPIX, CK]

            ra = 1.0 / one_minus
            msk = blended & (a > 0.0)
            v_alpha = jnp.where(
                msk, s_excl * v_w - (r_after + t_fin[sl] * f_t[sl]) * ra,
                0.0)

            unsat = og <= SATURATED_ALPHA_GRAD_CUTOFF
            mu = msk & unsat
            v_sigma = jnp.where(mu, -og * v_alpha, 0.0)
            # The mu mask must sit OUTSIDE every product with conic/dx
            # terms: a degenerate splat (inf conic from a near-singular 2D
            # covariance) contributes zero in the forward (its NaN alpha
            # fails the gate), but 0 * (inf * 0) = NaN here — and ONE NaN
            # on an in-span lane poisons every later splat through the
            # reduce's inclusive cumsum (the round-5 quality collapse).
            gxy_x = jnp.where(mu, -v_sigma * (c00 * dx + c01 * dy), 0.0)
            gxy_y = jnp.where(mu, -v_sigma * (c01 * dx + c11 * dy), 0.0)

            # Per-intersection reductions over this sub-block's pixels.
            gq_x = jnp.sum(gxy_x, axis=0, keepdims=True)   # [1, CK]
            gq_y = jnp.sum(gxy_y, axis=0, keepdims=True)
            g_xy_x = g_xy_x + gq_x
            g_xy_y = g_xy_y + gq_y
            g_c00 = g_c00 + jnp.sum(
                jnp.where(mu, 0.5 * v_sigma * dx * dx, 0.0), axis=0,
                keepdims=True)
            g_c01 = g_c01 + jnp.sum(
                jnp.where(mu, v_sigma * dx * dy, 0.0), axis=0,
                keepdims=True)
            g_c11 = g_c11 + jnp.sum(
                jnp.where(mu, 0.5 * v_sigma * dy * dy, 0.0), axis=0,
                keepdims=True)
            g_opa = g_opa + jnp.sum(jnp.where(mu, gauss * v_alpha, 0.0),
                                    axis=0, keepdims=True)

            # v_color[c, k] = sum_p w[p,k] v_rgb[p,c], gated by color > 0
            # (the blend uses max(color, 0), rasterize.rs:145-147).
            v_col = jax.lax.dot_general(
                v_rgb[sl], w, (((0,), (0,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)        # [3, CK]
            g_col0 = g_col0 + v_col[0:1]
            g_col1 = g_col1 + v_col[1:2]
            g_col2 = g_col2 + v_col[2:3]

            refine = refine + jnp.sum(
                jnp.sqrt((gxy_x * img_w) ** 2 + (gxy_y * img_h) ** 2)
                * inv_final_a[sl], axis=0, keepdims=True)  # [1, CK]
            w_total = w_total + jnp.sum(w, axis=0, keepdims=True)

            # Forward replay state update for this sub-block.
            t_new = jnp.min(jnp.where(blended, s_incl, t_acc), axis=1,
                            keepdims=True)
            crossed = jnp.any((s_incl <= TRANSMITTANCE_EPS) & ~done_in,
                              axis=1, keepdims=True)
            t_new_qs.append(jnp.where(done_in | crossed, -t_new, t_new))
            r_rem_qs.append(r_rem_q - prefix_incl[:, CK - 1:CK])

        g_col0 = jnp.where(data[6:7, :] > 0.0, g_col0, 0.0)
        g_col1 = jnp.where(data[7:8, :] > 0.0, g_col1, 0.0)
        g_col2 = jnp.where(data[8:9, :] > 0.0, g_col2, 0.0)

        rows = [
            g_xy_x, g_xy_y, g_c00, g_c01, g_c11, g_opa,
            g_col0, g_col1, g_col2,
            refine, w_total, key_row(data, c),
        ]
        grad_chunk = jnp.concatenate(
            rows + [zero_lane] * (SOA_ROWS - len(rows)), axis=0)
        obuf[slot] = grad_chunk
        out_dma(slot, c).start()

        t_signed_new = jnp.concatenate(t_new_qs, axis=0)
        r_rem_new = jnp.concatenate(r_rem_qs, axis=0)
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

    # Fill [nuseful, nchunks): zero gradients + real gid keys. DMA-in is
    # still needed for the gid row, but no blend math runs.
    @pl.when(c_fin < nchunks)
    def _():
        obuf[0] = jnp.zeros((SOA_ROWS, CK), jnp.float32)
        obuf[1] = jnp.zeros((SOA_ROWS, CK), jnp.float32)

        def fill(c, _):
            slot = c % 2

            @pl.when(c >= c_fin + 2)
            def _():
                out_dma(slot, c - 2).wait()

            @pl.when(c + 1 < nchunks)
            def _():
                in_dma(jax.lax.rem(c + 1, 2), c + 1).start()
            # Chunk 0 (nuseful == 0 case) lives in the cross-tile prefetch
            # slot, like the compute loop.
            rslot = jnp.where(c == 0, p_slot, jax.lax.rem(c, 2))
            in_dma(rslot, c).wait()
            data = _window(buf[rslot], r)
            obuf[slot, 11, :] = key_row(data, c)[0]
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

    # The compute while-loop always runs to exactly c_fin == nuseful (its
    # cond tests only c < nuseful — saturation shrinks nuseful via the
    # forward's useful_len, not via an early exit here). The prefetch for
    # chunk c_fin issued by iteration c_fin-1 (or the initial start when
    # nuseful == 0) is consumed by the fill loop's own in_dma(c_fin).wait(),
    # so nothing further needs draining here.


@functools.partial(jax.jit,
                   static_argnames=("img_size", "chunk_cap", "interpret"))
def rasterize_backward_pallas(soa, tile_ranges, chunk_starts, tiles, v_tiles,
                              bg, img_size, chunk_cap, interpret=False):
    """Per-chunk gradient blocks, lane-major [16, chunk_cap*CK], from image
    cotangents (chunk c's block = lanes [c*CK, (c+1)*CK))."""
    img_w, img_h = img_size
    tbw = -(-img_w // TILE_WIDTH)
    tbh = -(-img_h // TILE_WIDTH)
    n_tiles = tbw * tbh
    # Sentinel gid for out-of-span lanes in the kernel's key row. Any value
    # strictly greater than every real gid works (the reduce clips keys to
    # [0, n] and drops the n bucket); the SoA width is a convenient bound.
    n_splats_key = soa.shape[1]

    bg4 = jnp.concatenate([bg.astype(jnp.float32), jnp.zeros(1)]).reshape(1, 4)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),   # soa
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # fwd tiles
            pl.BlockSpec((1, 8, TILE_PIX), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),  # cotangent tiles
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bg
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((4, SOA_ROWS, W), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
            pltpu.VMEM((2, SOA_ROWS, CK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(_bwd_kernel, img_w=img_w, img_h=img_h,
                               n_splats=n_splats_key, chunk_cap=chunk_cap)
    grads = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((SOA_ROWS, chunk_cap * CK),
                                       jnp.float32),
        interpret=interpret,
    )(tile_ranges.reshape(-1), chunk_starts, soa, tiles, v_tiles, bg4)
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


def _reduce_grads_sorted(grads3, num_chunks, surv_starts_g, surv_counts_g, n,
                         chunk_valid=None):
    """Per-splat gradient reduction -> [N, 11] in GLOBAL splat order.

    The reference accumulates with f32 atomics (rasterize_backwards.rs
    HfAtomicAdd); TPU has none. A stable multi-payload sort by the gid key
    row brings every splat's per-intersection gradients into one contiguous
    run (sort payloads move at near-bandwidth, unlike per-index
    gathers/scatters), and the segment boundaries in sorted order are known
    analytically: the tiling pass counts each splat's surviving slots
    (Intersections.surv_*_g), so the reduce is one Pallas carry-scan cumsum
    plus a boundary difference — no boundary extraction, and the result
    lands directly in global splat order.

    `chunk_valid` ([chunk_cap] bool) marks chunks the backward kernel
    actually WROTE. It is NOT just `< num_chunks`: the kernel skips each
    tile's chunks past its useful range (the transmittance-saturation
    shrink, rasterize.rs:181-187), so those rows hold recycled-buffer
    garbage whose key row would clip into REAL splat ids and pollute the
    reduce — NaN garbage then poisons every later splat through the
    inclusive cumsum (the round-5 quality-run collapse).
    """
    gt = grads3                                            # [16, L] lane-major
    l = gt.shape[1]
    chunk_ids = jnp.arange(l, dtype=jnp.int32) // CK
    chunk_ok = chunk_ids < num_chunks
    if chunk_valid is not None:
        chunk_ok = chunk_ok & chunk_valid[chunk_ids]
    key = jnp.where(chunk_ok, gt[11], jnp.float32(n)).astype(jnp.int32)
    key = jnp.clip(key, 0, n).astype(jnp.uint32)
    # Sentinel-keyed lanes carry garbage/NaN VALUES: unwritten chunk rows
    # hold recycled memory, and the out-of-span lanes of WRITTEN chunks
    # compute 0 * inf = NaN from the soa's garbage tail. They sort past
    # every real key, but the useful-range shrink leaves some real splats'
    # boundary positions pointing INTO that tail (their shrunk slots have
    # zero true gradient), and the inclusive cumsum would carry any NaN
    # into every later boundary read. Zeroing them makes the tail an exact
    # no-op for every boundary difference.
    gt = jnp.where((key < jnp.uint32(n))[None, :], gt, 0.0)
    # Non-stable: tie order within a splat only permutes the summation
    # order, and XLA's sorting network is a fixed deterministic program —
    # same inputs give bitwise-identical sums run to run (the reference's
    # atomic adds don't even guarantee that). Payloads ride as plain f32
    # operands — the sort is payload-count-flat (ops/tiling_key.py).
    from brush_tpu.ops.tiling_key import sort_packed
    _, rows_sorted = sort_packed(key, [gt[i] for i in range(11)])
    if jax.default_backend() == "cpu":
        g_sorted = jnp.stack(rows_sorted, axis=0)          # [11, L] gid-major
    else:
        # XLA's strided 1-D-rows -> matrix stack is the measured-slow op;
        # the Pallas block copy runs at bandwidth (ops/scan_pallas.py).
        from brush_tpu.ops.scan_pallas import stack_rows
        g_sorted = stack_rows(rows_sorted, 11, l)[:, :l]
    cs = _cumsum_flat_rows(g_sorted)                       # [11, L]
    csp = jnp.concatenate([jnp.zeros((11, 1), cs.dtype), cs], axis=1)
    # Segments are contiguous in global order (starts are an exclusive
    # cumsum), so segment ends are the next segment's starts: ONE gather at
    # N+1 boundaries + a shifted difference, not two N-sized gathers.
    # Gather ROWS of the transposed cumsum: XLA's minor-dim (column) gather
    # on [11, L] runs at the ~24 ns/index random rate even for sorted
    # indices, while a row gather on [L+1, 11] with ascending indices hits
    # the ~7 ns semi-sorted path — the transpose relayout is bandwidth-cheap
    # by comparison (measured ~60 ms -> ~25 ms at 2M splats).
    ends = surv_starts_g[-1:] + surv_counts_g[-1:]
    bpos = jnp.clip(jnp.concatenate([surv_starts_g, ends]), 0, l)
    b = csp.T[bpos]                                        # [N+1, 11]
    return b[1:] - b[:-1]                                  # [N, 11] global


def _use_interpret():
    import jax as _jax
    return _jax.default_backend() == "cpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(13, 14))
def rasterize_pallas(mean2d, conic, color, opac, refine_holder,
                     visible_holder, soa, tile_ranges, chunk_starts,
                     num_chunks, surv_starts_g, surv_counts_g,
                     bg, img_size, chunk_cap):
    """Production rasterize: [H, W, 4] image via the Pallas kernels.

    Differentiable w.r.t. mean2d/conic/color/opac/bg — the actual forward
    consumes the (gradient-stopped) sorted `soa` from ops/tiling.py; the
    per-splat parameter arrays are declared so the custom VJP can return
    their cotangents directly in global splat order, exactly like the
    reference's hand-written backward node (burn_glue.rs:115-176).
    `refine_holder` and `visible_holder` are zeros-[N] dummies whose
    cotangents carry the densify refine weight and the
    contributed-visibility mask (burn_glue.rs:252,269; rasterize.rs:141-143).
    """
    img, _ = _rasterize_pallas_fwd_impl(soa, tile_ranges, bg, img_size)
    return img


def _rasterize_pallas_fwd_impl(soa, tile_ranges, bg, img_size):
    tiles = rasterize_forward_pallas(soa, tile_ranges, bg, img_size,
                                     interpret=_use_interpret())
    return tiles_to_image(tiles, img_size), tiles


def _rasterize_pallas_fwd(mean2d, conic, color, opac, refine_holder,
                          visible_holder, soa, tile_ranges, chunk_starts,
                          num_chunks, surv_starts_g, surv_counts_g,
                          bg, img_size, chunk_cap):
    img, tiles = _rasterize_pallas_fwd_impl(soa, tile_ranges, bg, img_size)
    res = (soa, tiles, tile_ranges, chunk_starts, num_chunks,
           surv_starts_g, surv_counts_g, bg, mean2d.shape[0])
    return img, res


def _rasterize_pallas_bwd(img_size, chunk_cap, res, v_img):
    (soa, tiles, tile_ranges, chunk_starts, num_chunks,
     surv_starts_g, surv_counts_g, bg, n) = res

    v_tiles = image_to_tiles(v_img, img_size)
    grads3 = rasterize_backward_pallas(
        soa, tile_ranges, chunk_starts, tiles, v_tiles, bg, img_size,
        chunk_cap, interpret=_use_interpret())

    # Chunks the kernel actually wrote: each tile fills only
    # ceil(useful_len / CK) of its ceil(span / CK) chunk slots (the
    # saturation shrink) — the rest stay unwritten recycled memory and
    # must be masked out of the reduce (see _reduce_grads_sorted).
    useful_len = tiles[:, 5, 0]                            # [T] f32
    nuseful = jnp.where(useful_len > 0.0,
                        (useful_len + (CK - 1)) // CK, 0.0).astype(jnp.int32)
    cidx = jnp.arange(chunk_cap, dtype=jnp.int32)
    t_of = jnp.clip(
        jnp.searchsorted(chunk_starts, cidx, side="right").astype(jnp.int32)
        - 1, 0, chunk_starts.shape[0] - 1)
    chunk_valid = (cidx - chunk_starts[t_of]) < nuseful[t_of]

    per_splat = _reduce_grads_sorted(
        grads3, num_chunks, surv_starts_g, surv_counts_g, n,
        chunk_valid=chunk_valid)                           # [n,11]

    v_mean2d = per_splat[:, 0:2]
    v_conic = per_splat[:, 2:5]
    v_opac = per_splat[:, 5]
    v_color = per_splat[:, 6:9]
    v_refine = jnp.clip(jnp.nan_to_num(per_splat[:, 9], nan=0.0), 0.0,
                        REFINE_WEIGHT_CLAMP)
    v_visible = (per_splat[:, 10] > 0.0).astype(jnp.float32)

    # v_bg = sum_p T_p * v_rgb_p over real pixels (tiles carry T in row 4).
    t_img = tiles_to_image(tiles, img_size)  # rgba; alpha = 1 - T
    t_map = 1.0 - t_img[..., 3]
    v_bg = jnp.einsum("hw,hwc->c", t_map, v_img[..., :3],
                      precision=jax.lax.Precision.HIGHEST)

    zero_int = lambda x: _np.zeros(x.shape, jax.dtypes.float0)
    return (v_mean2d, v_conic, v_color, v_opac, v_refine, v_visible,
            jnp.zeros_like(soa), zero_int(tile_ranges),
            zero_int(chunk_starts), zero_int(num_chunks),
            zero_int(surv_starts_g), zero_int(surv_counts_g), v_bg)


rasterize_pallas.defvjp(_rasterize_pallas_fwd, _rasterize_pallas_bwd)
