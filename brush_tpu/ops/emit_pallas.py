"""Fused slot-emission kernel: per-splat table -> sort operands, one pass.

Round-4 finding (benches/microbench_emitsplit.py, v5e): the pre-sort slot
materialization — dense broadcasts, remainder one-hot expansion, local->tile
decodes, and the 12 operand concats — cost ~18 ms/frame as separate XLA
ops, a third of the whole binning phase, because every piece round-trips
HBM. This kernel fuses ALL of it: one grid walks the dense region then the
remainder region and writes the sort operands block by block.

Round-5 restructuring (the round-4 kernel measured ~21 ms against a ~1 ms
bandwidth bound — it was DMA-ISSUE bound, not bandwidth bound):
  * ONE matrix output block [16, BLKS] per grid step (key bit pattern in
    row 0, payload rows 1..9, gid row 10) instead of 11 separate 1-D
    16 KB output streams — 1 output DMA per step instead of 11;
  * the dense region is BLOCK-k-major: each block covers GS splats and
    emits their first k0 slots as k0 static lane sub-ranges sharing ONE
    table window DMA — the round-4 k-major layout re-read every table
    window k0 times (4x the dense input traffic at k0=4).

Semantics (must match ops/tiling.py's jnp emission as a multiset):
  * dense slot (k, g): k-th emitted tile of splat g if k < counts[g],
    else the sentinel key;
  * remainder slot s: owner g found by the monotone-start window walk,
    emission rank j = k0 + s - starts[g], local tile decoded through the
    owner's exact-hit bitmask;
  * combined key = tile_id << depth_bits_kept | depth_bits >> tile_bits —
    one u32 that orders (tile, truncated depth); the sentinel tile
    (num_tiles) sorts past every real tile (map_gaussians.rs:53-57).

Table row layout (in the aug table, f32):
  0..8   payload: xy(2), conic(3), opac, rgb(3)
  9      gid
  10     depth bit pattern (bitcast)
  11,12  tile_min x, y
  13     bbox width (>=1)
  14     exact emission count
  15,16  hit-mask limbs (lo16, hi16)
  17,18  remainder start limbs (12-bit, exact past 2^24)

Reference counterpart: map_gaussians.rs (slot expansion) + the operand
staging the reference never needs because its rasterizer gathers per splat
(GPUs gather; TPUs transport — SURVEY.md §2.1 mapping notes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from brush_tpu.ops.tiling_key import B_SCAN

import os as _os

# Slots per grid step / remainder inner sub-chunk width / remainder
# owner-window width (gids per DMA). BLKS=4096 measured best on v5e —
# both the 16384-step variant (+20 us/step grid floor at matrix blocks,
# microbench_r05probes gridfloor rows) and smaller steps lose; the
# remainder math runs in RSUB-wide sub-chunks inside each step to bound
# the [W, RSUB] one-hot working set. Only the defaults are covered by
# the parity suites, so overrides require an explicit unsafe opt-in — a
# stray env var must not silently retile the production kernel.
BLKS, RSUB, W = 4096, 4096, 256
if _os.environ.get("BRUSH_TPU_UNSAFE_TUNE") == "1":
    import warnings as _warnings
    BLKS = int(_os.environ.get("BRUSH_TPU_EMIT_BLKS", BLKS))
    W = int(_os.environ.get("BRUSH_TPU_EMIT_W", W))
    if (BLKS, W) != (4096, 256):
        _warnings.warn(
            f"emit kernel geometry overridden to BLKS={BLKS} W={W} "
            "(BRUSH_TPU_UNSAFE_TUNE) — untested tiling", stacklevel=1)
assert BLKS % RSUB == 0

OUT_ROWS = 16  # key + 9 payload + gid, padded to the f32 sublane tile


def _dense_gs(k0: int) -> int:
    """Splats per dense block: the largest 128-multiple with GS*k0 <= BLKS
    (128-aligned lane sub-ranges; the <=6% unused lane tail emits
    sentinels that sort past every real slot)."""
    gs = (BLKS // k0) // 128 * 128
    assert gs >= 128, (BLKS, k0)
    return gs


def _select_bit(mask_u32, j):
    """Position of the j-th (0-based) set bit of each uint32; callers
    guarantee j < popcount(mask). 32-step unrolled elementwise scan."""
    cnt = jnp.zeros_like(j)
    pos = jnp.zeros_like(j)
    for b in range(B_SCAN):
        bit = ((mask_u32 >> jnp.uint32(b)) & jnp.uint32(1)).astype(j.dtype)
        here = (bit == 1) & (cnt == j)
        pos = jnp.where(here, b, pos)
        cnt = cnt + bit
    return pos


def _decode_slot(vals, j, *, tile_bw: int, num_tiles: int, tile_bits: int,
                 extra_in=None):
    """Shared dense/remainder slot decode from attribute rows `vals`
    ([rows, L]) and emission ranks `j` ([1, L] int32). Returns the combined
    key as an f32 BIT PATTERN row [1, L] (stored in the matrix output)."""
    counts = vals[14:15].astype(jnp.int32)
    # Mosaic has no f32->u32 cast; route through i32 (values < 2^16).
    mask = (vals[15:16].astype(jnp.int32).astype(jnp.uint32)
            | (vals[16:17].astype(jnp.int32).astype(jnp.uint32)
               << jnp.uint32(16)))
    pc = jax.lax.population_count(mask).astype(jnp.int32)
    local = jnp.where(j < pc, _select_bit(mask, jnp.minimum(j, pc)),
                      B_SCAN + j - pc)
    bb_w = jnp.maximum(vals[13:14].astype(jnp.int32), 1)
    tx = vals[11:12].astype(jnp.int32) + local % bb_w
    ty = vals[12:13].astype(jnp.int32) + local // bb_w
    in_range = (j >= 0) & (j < counts)
    if extra_in is not None:
        in_range = in_range & extra_in
    tile = jnp.where(in_range, ty * tile_bw + tx, num_tiles)
    depth_u = pltpu.bitcast(vals[10:11], jnp.uint32)
    key = ((tile.astype(jnp.uint32) << jnp.uint32(32 - tile_bits))
           | (depth_u >> jnp.uint32(tile_bits)))
    # The key leaves the kernel as two u16-limb f32 rows: a raw bitcast
    # can form NaN bit patterns (tile/depth with exponent bits all-1),
    # which a copy path is free to canonicalize. Limbs are exact in f32.
    key_i = pltpu.bitcast(key, jnp.int32)
    return ((key_i & 0xFFFF).astype(jnp.float32),
            ((key_i >> 16) & 0xFFFF).astype(jnp.float32))


def _emit_kernel(lo_ref,                 # scalar-prefetch [nr_blocks+1] i32
                 table_ref,              # [rows_pad, n_pad] f32 ANY
                 out_ref,                # [OUT_ROWS, BLKS] f32 out block
                 dwin, dsem, tbuf, tsem,  # scratch
                 *, nd_blocks: int, gs: int, k0: int,
                 tile_bw: int, num_tiles: int, tile_bits: int,
                 rows_pad: int):
    b = pl.program_id(0)

    # --- dense region: block b covers splats [b*gs, (b+1)*gs) and emits
    # their first k0 slots as k0 static lane sub-ranges of one output
    # block, all decoding from ONE table window. Cross-block pipelining:
    # manual DMAs don't overlap across grid steps, so each dense block
    # prefetches the NEXT block's window into the opposite parity slot
    # while it computes (block 0 pays latency once).
    def dense_dma(blk):
        i0 = pl.multiple_of(blk * gs, 128)
        slot = jax.lax.rem(blk, 2)
        return pltpu.make_async_copy(
            table_ref.at[:, pl.ds(i0, gs)], dwin.at[slot], dsem.at[slot])

    @pl.when(b < nd_blocks)
    def _():
        @pl.when(b == 0)
        def _():
            dense_dma(b).start()

        @pl.when(b + 1 < nd_blocks)
        def _():
            dense_dma(b + 1).start()
        dense_dma(b).wait()
        win = dwin[jax.lax.rem(b, 2)]
        for k in range(k0):
            j = jnp.full((1, gs), k, jnp.int32)
            key_lo, key_hi = _decode_slot(
                win, j, tile_bw=tile_bw, num_tiles=num_tiles,
                tile_bits=tile_bits)
            out_ref[0:1, k * gs:(k + 1) * gs] = key_lo
            out_ref[1:11, k * gs:(k + 1) * gs] = win[:10]
            out_ref[11:12, k * gs:(k + 1) * gs] = key_hi
        if k0 * gs < BLKS:  # unused lane tail -> sentinel slots
            sent = num_tiles << (32 - tile_bits)
            tail = BLKS - k0 * gs
            out_ref[0:1, k0 * gs:] = jnp.full((1, tail), sent & 0xFFFF,
                                              jnp.float32)
            out_ref[1:11, k0 * gs:] = jnp.zeros((10, tail), jnp.float32)
            out_ref[11:12, k0 * gs:] = jnp.full(
                (1, tail), (sent >> 16) & 0xFFFF, jnp.float32)
        out_ref[12:, :] = jnp.zeros((OUT_ROWS - 12, BLKS), jnp.float32)

    # --- remainder region: the windowed one-hot expansion + decode,
    # processed as BLKS/RSUB inner sub-chunks so the [W, RSUB] one-hot
    # and the accumulator stay VMEM-sized while grid steps stay big.
    @pl.when(b >= nd_blocks)
    def _():
        rb = b - nd_blocks
        jj = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
        kk = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
        eye = (jj == kk).astype(jnp.float32)

        def to_col(row):                 # [1, W] f32 -> [W, 1] f32, exact
            return jax.lax.dot_general(
                eye, row, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32)

        def dot_onehot(vals, onehot_f32):
            # exact f32 transport as three bf16 MXU passes (one-hot columns
            # have a single nonzero; each bf16 limb is exact per term)
            hi_ = vals.astype(jnp.bfloat16)
            rem = vals - hi_.astype(jnp.float32)
            mid = rem.astype(jnp.bfloat16)
            lo_ = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
            oh = onehot_f32.astype(jnp.bfloat16)
            dims = (((1,), (0,)), ((), ()))
            out = jax.lax.dot_general(hi_, oh, dims,
                                      preferred_element_type=jnp.float32)
            out += jax.lax.dot_general(mid, oh, dims,
                                       preferred_element_type=jnp.float32)
            out += jax.lax.dot_general(lo_, oh, dims,
                                       preferred_element_type=jnp.float32)
            return out

        for i in range(BLKS // RSUB):
            sid = rb * (BLKS // RSUB) + i
            lo = lo_ref[sid]
            hi = lo_ref[sid + 1]
            w0 = (lo // 128) * 128
            n_win = (hi - w0) // W + 1

            slot0 = sid * RSUB
            slots = slot0 + jax.lax.broadcasted_iota(
                jnp.int32, (1, RSUB), 1)

            def dma(slot, kwin, w0=w0):
                off = pl.multiple_of(w0 + kwin * W, 128)
                return pltpu.make_async_copy(
                    table_ref.at[:, pl.ds(off, W)], tbuf.at[slot],
                    tsem.at[slot])

            dma(0, 0).start()

            def cond(carry):
                kwin, _ = carry
                return kwin < n_win

            def body(carry, slots=slots, dma=dma):
                kwin, acc = carry
                slot = kwin % 2

                @pl.when(kwin + 1 < n_win)
                def _():
                    dma(1 - slot, kwin + 1).start()
                dma(slot, kwin).wait()

                win = tbuf[slot]                         # [rows_pad, W]
                sc = (to_col(win[17:18]).astype(jnp.int32)
                      + to_col(win[18:19]).astype(jnp.int32) * 4096)
                cnt = to_col(win[14:15]).astype(jnp.int32)
                rc = jnp.maximum(cnt - k0, 0)
                onehot = ((sc <= slots) & (slots < sc + rc)
                          ).astype(jnp.float32)          # [W, RSUB]
                acc = acc + dot_onehot(win, onehot)
                return (kwin + 1, acc)

            _, vals = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32),
                             jnp.zeros((rows_pad, RSUB), jnp.float32)))

            start = (vals[17:18].astype(jnp.int32)
                     + vals[18:19].astype(jnp.int32) * 4096)
            j = k0 + (slots - start)
            # Out-of-budget slots (truncated expansion / past rem_needed)
            # have all-zero vals -> counts 0 -> j >= counts -> sentinel.
            # Slots whose owner's run was cut by the cap get j >= counts
            # via the per-owner bound; j < k0 can only arise from a
            # zero-fill (start 0) and is masked explicitly.
            key_lo, key_hi = _decode_slot(
                vals, j, tile_bw=tile_bw, num_tiles=num_tiles,
                tile_bits=tile_bits, extra_in=(j >= k0))
            sl = slice(i * RSUB, (i + 1) * RSUB)
            out_ref[0:1, sl] = key_lo
            out_ref[1:11, sl] = vals[:10]
            out_ref[11:12, sl] = key_hi
            out_ref[12:, sl] = jnp.zeros((OUT_ROWS - 12, RSUB), jnp.float32)


def emit_sizes(n: int, k0: int, rem_cap: int):
    """Static emission geometry: (s_pad, n_pad, rem_pad). The dense region
    is block-k-major over ceil(n/GS) blocks of GS splats x k0 slots; the
    remainder region is rem_pad wide."""
    gs = _dense_gs(k0)
    nd_blocks = -(-n // gs)
    rem_pad = -(-rem_cap // BLKS) * BLKS
    return nd_blocks * BLKS + rem_pad, nd_blocks * gs, rem_pad


@functools.partial(
    jax.jit,
    static_argnames=("k0", "rem_cap", "img_size", "interpret"))
def emit_slots(table_rows, rem_starts, k0: int, rem_cap: int,
               img_size: tuple[int, int], interpret: bool = False):
    """Emit the tile-sort operands from the per-splat attribute rows.

    table_rows: 17 f32 [N] arrays (rows documented in the module
    docstring, without the start limbs — they are appended here). The aug
    table assembles via the Pallas row stack — XLA's strided 1-D-rows ->
    matrix stack measured ~8 ms at [17, 1M] inside the counts stage.
    rem_starts: [N] i32 exclusive cumsum of max(counts - k0, 0). Returns
    one f32 matrix [OUT_ROWS, S_pad]: rows (0, 11) the combined u32 key
    as exact u16 limbs (lo, hi), rows 1..9 the payload, row 10 gid, rows
    12..15 zero padding — S_pad from emit_sizes() (this function is
    jitted, so returning sizes here would hand back traced scalars).
    """
    from brush_tpu.constants import TILE_WIDTH
    img_w, img_h = img_size
    tile_bw = -(-img_w // TILE_WIDTH)
    num_tiles = tile_bw * (-(-img_h // TILE_WIDTH))
    tile_bits = max(int(num_tiles).bit_length(), 1)

    table_rows = list(table_rows)
    assert len(table_rows) == 17, len(table_rows)
    n = table_rows[0].shape[0]
    gs = _dense_gs(k0)
    nd_blocks = -(-n // gs)
    n_pad = nd_blocks * gs
    rem_pad = -(-rem_cap // BLKS) * BLKS
    nr_blocks = rem_pad // BLKS
    s_pad = nd_blocks * BLKS + rem_pad

    rows_pad = -(-19 // 8) * 8
    lane_pad = max(n_pad, -(-n // 128) * 128 + W)  # window DMAs stay in bounds
    from brush_tpu.ops.scan_pallas import stack_rows
    aug = stack_rows(
        table_rows + [(rem_starts % 4096).astype(jnp.float32),
                      (rem_starts // 4096).astype(jnp.float32)],
        rows_pad, lane_pad, interpret=interpret)

    # Remainder owner windows at sub-chunk granularity: owner of slot s =
    # last g with starts[g] <= s.
    q = jnp.arange(rem_pad // RSUB + 1, dtype=jnp.int32) * RSUB
    lo = jnp.maximum(
        jnp.searchsorted(rem_starts, q, side="right").astype(jnp.int32) - 1,
        0)

    kernel = functools.partial(
        _emit_kernel, nd_blocks=nd_blocks, gs=gs, k0=k0,
        tile_bw=tile_bw, num_tiles=num_tiles, tile_bits=tile_bits,
        rows_pad=rows_pad)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nd_blocks + nr_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((OUT_ROWS, BLKS), lambda b, lo_: (0, b)),
            scratch_shapes=[
                pltpu.VMEM((2, rows_pad, gs), jnp.float32),   # dense wins
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, rows_pad, W), jnp.float32),    # rem windows
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((OUT_ROWS, s_pad), jnp.float32),
        interpret=interpret,
    )(lo, aug)
    return out
