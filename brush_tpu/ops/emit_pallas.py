"""Fused slot-emission kernel: per-splat table -> sort operands, one pass.

Round-4 finding (benches/microbench_emitsplit.py, v5e): the pre-sort slot
materialization — dense broadcasts, remainder one-hot expansion, local->tile
decodes, and the 12 operand concats — cost ~18 ms/frame as separate XLA
ops, a third of the whole binning phase, because every piece round-trips
HBM. This kernel fuses ALL of it: one grid walks the dense region (k-major
[K0, N_pad]) then the remainder region ([rem_cap]), and writes the final
sort-operand arrays (combined sort key + 10 attribute rows) block by block.
Every input byte is read once; every output byte is written once.

Semantics (must match ops/tiling.py's jnp emission bitwise):
  * dense slot (k, g): k-th emitted tile of splat g if k < counts[g],
    else the sentinel key;
  * remainder slot s: owner g found by the monotone-start window walk
    (ops/expand_pallas.py), emission rank j = k0 + s - starts[g], local
    tile decoded through the owner's exact-hit bitmask;
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

# Slots per grid step (and dense table window width) / remainder
# owner-window width (gids per DMA). Env-overridable for perf experiments.
BLKS = int(_os.environ.get("BRUSH_TPU_EMIT_BLKS", "4096"))
W = int(_os.environ.get("BRUSH_TPU_EMIT_W", "256"))


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
    ([rows, L]) and emission ranks `j` ([1, L] int32). Returns
    (key u32 [1, L], gid f32 [1, L])."""
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
    return key, vals[9:10]


def _emit_kernel(lo_ref,                 # scalar-prefetch [nr_blocks+1] i32
                 table_ref,              # [rows_pad, n_pad] f32 ANY
                 key_ref,                # [BLKS] u32 out block
                 *out_refs,              # 10 x [BLKS] f32 out blocks + scratch
                 nd_blocks: int, nb: int, n_pad: int, k0: int,
                 tile_bw: int, num_tiles: int, tile_bits: int,
                 rows_pad: int):
    (p0, p1, p2, p3, p4, p5, p6, p7, p8, gid_ref,
     dwin, dsem, tbuf, tsem) = out_refs
    b = pl.program_id(0)
    payload_refs = (p0, p1, p2, p3, p4, p5, p6, p7, p8)

    def write_outs(key, gid, pays):
        key_ref[...] = key[0]
        gid_ref[...] = gid[0]
        for r, ref in enumerate(payload_refs):
            ref[...] = pays[r]

    # --- dense region: block b -> (k = b // nb, window i0 = (b % nb)*BLKS)
    # Cross-block pipelining: manual DMAs don't overlap across grid steps,
    # so each dense block prefetches the NEXT block's table window into the
    # opposite parity slot while it computes (block 0 pays latency once).
    def dense_dma(blk):
        i0 = pl.multiple_of((blk % nb) * BLKS, BLKS)
        slot = jax.lax.rem(blk, 2)
        return pltpu.make_async_copy(
            table_ref.at[:, pl.ds(i0, BLKS)], dwin.at[slot],
            dsem.at[slot])

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
        k = b // nb
        j = jnp.full((1, BLKS), k, jnp.int32)
        key, gid = _decode_slot(
            win, j, tile_bw=tile_bw, num_tiles=num_tiles,
            tile_bits=tile_bits)
        write_outs(key, gid, [win[r] for r in range(9)])

    # --- remainder region: the windowed one-hot expansion + decode
    @pl.when(b >= nd_blocks)
    def _():
        rb = b - nd_blocks
        lo = lo_ref[rb]
        hi = lo_ref[rb + 1]
        w0 = (lo // 128) * 128
        n_win = (hi - w0) // W + 1

        slot0 = rb * BLKS
        slots = slot0 + jax.lax.broadcasted_iota(jnp.int32, (1, BLKS), 1)
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

        def dma(slot, kwin):
            off = pl.multiple_of(w0 + kwin * W, 128)
            return pltpu.make_async_copy(
                table_ref.at[:, pl.ds(off, W)], tbuf.at[slot],
                tsem.at[slot])

        dma(0, 0).start()

        def cond(carry):
            kwin, _ = carry
            return kwin < n_win

        def body(carry):
            kwin, acc = carry
            slot = kwin % 2

            @pl.when(kwin + 1 < n_win)
            def _():
                dma(1 - slot, kwin + 1).start()
            dma(slot, kwin).wait()

            win = tbuf[slot]                             # [rows_pad, W]
            sc = (to_col(win[17:18]).astype(jnp.int32)
                  + to_col(win[18:19]).astype(jnp.int32) * 4096)
            cnt = to_col(win[14:15]).astype(jnp.int32)
            rc = jnp.maximum(cnt - k0, 0)
            onehot = ((sc <= slots) & (slots < sc + rc)
                      ).astype(jnp.float32)              # [W, BLKS]
            acc = acc + dot_onehot(win, onehot)
            return (kwin + 1, acc)

        _, vals = jax.lax.while_loop(
            cond, body, (jnp.asarray(0, jnp.int32),
                         jnp.zeros((rows_pad, BLKS), jnp.float32)))

        start = (vals[17:18].astype(jnp.int32)
                 + vals[18:19].astype(jnp.int32) * 4096)
        j = k0 + (slots - start)
        # Out-of-budget slots (truncated expansion / past rem_needed) have
        # all-zero vals -> counts 0 -> j >= counts -> sentinel. Slots whose
        # owner's run was cut by the cap get j >= counts via the per-owner
        # bound; j < k0 can only arise from a zero-fill (start 0) and is
        # masked explicitly.
        key, gid = _decode_slot(
            vals, j, tile_bw=tile_bw, num_tiles=num_tiles,
            tile_bits=tile_bits, extra_in=(j >= k0))
        write_outs(key, gid, [vals[r] for r in range(9)])


def emit_sizes(n: int, k0: int, rem_cap: int):
    """Static emission geometry: (s_pad, n_pad, rem_pad). The dense region
    is k-major over [k0, n_pad]; the remainder region is rem_pad wide."""
    n_pad = -(-n // BLKS) * BLKS
    rem_pad = -(-rem_cap // BLKS) * BLKS
    return k0 * n_pad + rem_pad, n_pad, rem_pad


@functools.partial(
    jax.jit,
    static_argnames=("k0", "rem_cap", "img_size", "interpret"))
def emit_slots(table, rem_starts, k0: int, rem_cap: int,
               img_size: tuple[int, int], interpret: bool = False):
    """Emit the tile-sort operands from the per-splat attribute table.

    table: [17, N] f32 (rows documented in the module docstring, without
    the start limbs — they are appended here). rem_starts: [N] i32
    exclusive cumsum of max(counts - k0, 0). Returns
    (key u32 [S_pad], payload rows 9 x f32 [S_pad], gid f32 [S_pad])
    with S_pad from emit_sizes() — callers get the STATIC sizes from
    emit_sizes(); this function is jitted, so returning them here would
    hand back traced scalars.
    """
    from brush_tpu.constants import TILE_WIDTH
    img_w, img_h = img_size
    tile_bw = -(-img_w // TILE_WIDTH)
    num_tiles = tile_bw * (-(-img_h // TILE_WIDTH))
    tile_bits = max(int(num_tiles).bit_length(), 1)

    rows, n = table.shape
    assert rows == 17, table.shape
    n_pad = -(-n // BLKS) * BLKS
    rem_pad = -(-rem_cap // BLKS) * BLKS
    nb = n_pad // BLKS
    nd_blocks = k0 * nb
    nr_blocks = rem_pad // BLKS
    s_pad = nd_blocks * BLKS + rem_pad

    aug = jnp.concatenate([
        table,
        (rem_starts % 4096).astype(jnp.float32)[None],
        (rem_starts // 4096).astype(jnp.float32)[None],
    ], axis=0)
    rows_aug = rows + 2
    rows_pad = -(-rows_aug // 8) * 8
    lane_pad = n_pad + W  # window DMAs never run off the end
    aug = jnp.pad(aug, ((0, rows_pad - rows_aug), (0, lane_pad - n)))

    # Remainder owner windows: owner of slot s = last g with starts[g] <= s.
    q = jnp.arange(nr_blocks + 1, dtype=jnp.int32) * BLKS
    lo = jnp.maximum(
        jnp.searchsorted(rem_starts, q, side="right").astype(jnp.int32) - 1,
        0)

    out_shapes = ([jax.ShapeDtypeStruct((s_pad,), jnp.uint32)]
                  + [jax.ShapeDtypeStruct((s_pad,), jnp.float32)] * 10)
    out_specs = [pl.BlockSpec((BLKS,), lambda b, lo_: (b,))] * 11

    kernel = functools.partial(
        _emit_kernel, nd_blocks=nd_blocks, nb=nb, n_pad=n_pad, k0=k0,
        tile_bw=tile_bw, num_tiles=num_tiles, tile_bits=tile_bits,
        rows_pad=rows_pad)
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nd_blocks + nr_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=out_specs,
            scratch_shapes=[
                pltpu.VMEM((2, rows_pad, BLKS), jnp.float32),  # dense wins
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.VMEM((2, rows_pad, W), jnp.float32),   # rem windows
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=out_shapes,
        interpret=interpret,
    )(lo, aug)
    key = outs[0]
    pays = outs[1:10]
    gid = outs[10]
    return key, pays, gid
