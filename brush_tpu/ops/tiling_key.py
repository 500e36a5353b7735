"""Shared tile-sort key/packing helpers (used by ops/tiling.py and the
fused emission kernel, which cannot import ops/tiling.py circularly).

Round-5 v5e measurement (benches/microbench_r05probes.py): lax.sort at
6.1M slots costs ~8.4 ms FLAT regardless of payload operand count, so
payloads ride as plain f32 operands (the round-4 u64 pair-packing was
emulated-64-bit overhead, removed). The key design stands:

  * ONE combined u32 key: tile_id in the top bits, the splat's depth bit
    pattern truncated into the rest. Orders (tile, depth) exactly except
    for depths equal in their kept bits — those tie and resolve by XLA's
    fixed sorting network (deterministic run to run; the golden-image
    suites pass, which is the acceptance bar — the reference's stable
    radix only pins tie order for bitwise-equal full-depth keys).

The sentinel tile (num_tiles) still sorts past every real tile
(map_gaussians.rs:53-57) because it is the largest tile field value.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Exact gaussian-vs-tile testing covers the first B_SCAN bbox-local slots
# of every splat (see ops/tiling.py); the hit mask must fit one uint32
# split into two <2^16 f32 limb rows.
B_SCAN = 32
assert B_SCAN <= 32, "hit mask must fit a uint32 (two 16-bit limb rows)"


def tile_key_bits(num_tiles: int) -> int:
    """Bits reserved for the tile field (sentinel num_tiles included)."""
    return max(int(num_tiles).bit_length(), 1)


def combined_key(tile_id, depth_bits, num_tiles: int):
    """u32 sort key: tile in the top bits, truncated depth below.

    tile_id: int32 in [0, num_tiles] (sentinel == num_tiles).
    depth_bits: int32 bit pattern of max(depth, 0) — non-negative floats
    compare correctly as unsigned ints.
    """
    tb = tile_key_bits(num_tiles)
    return (tile_id.astype(jnp.uint32) << jnp.uint32(32 - tb)
            | (depth_bits.astype(jnp.uint32) >> jnp.uint32(tb)))


def tile_boundary_keys(num_tiles: int):
    """Query keys whose searchsorted(side='left') positions are the tile
    range boundaries in the combined-key-sorted order."""
    tb = tile_key_bits(num_tiles)
    t = jnp.arange(num_tiles + 1, dtype=jnp.uint32)
    return t << jnp.uint32(32 - tb)


def _f16_bits_u32(x):
    """f32 -> IEEE f16 bit pattern widened to u32 (XLA-level; float16 is a
    storage type TPU XLA converts through f32)."""
    h = x.astype(jnp.float16)
    return jax.lax.bitcast_convert_type(h, jnp.uint16).astype(jnp.uint32)


def _pack2f16(a, b):
    """Two f32 rows -> one f32-bitcast row holding (f16(a) | f16(b) << 16)."""
    u = _f16_bits_u32(a) | (_f16_bits_u32(b) << jnp.uint32(16))
    return jax.lax.bitcast_convert_type(u, jnp.float32)


def _unpack2f16(row):
    u = jax.lax.bitcast_convert_type(row, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(
        (u & jnp.uint32(0xFFFF)).astype(jnp.uint16), jnp.float16)
    hi = jax.lax.bitcast_convert_type(
        (u >> jnp.uint32(16)).astype(jnp.uint16), jnp.float16)
    return lo.astype(jnp.float32), hi.astype(jnp.float32)


def _slot_tile_origin(key, num_tiles: int, tile_bw: int):
    """Per-slot emission-tile pixel origin recovered from the sort key."""
    tb = tile_key_bits(num_tiles)
    tile = (key >> jnp.uint32(32 - tb)).astype(jnp.int32)
    from brush_tpu.constants import TILE_WIDTH
    tx = tile % tile_bw
    ty = tile // tile_bw
    return ((tx * TILE_WIDTH).astype(jnp.float32),
            (ty * TILE_WIDTH).astype(jnp.float32))


def pack_fwd_rows(key, rows9, num_tiles: int, tile_bw: int):
    """Forward-only payload diet: 9 f32 rows -> 6 rows (2 f32 xy + 4
    u16-pair). The win is downstream of the sort (which is payload-count-
    flat): a 6-row diet SoA nearly halves the Pallas stack width and the
    rasterizer's per-chunk input bandwidth, and the kernel decodes the
    pairs in place (_decode_diet).

    Lossy by design — the viewer/inference specialization only (the
    reference's fwd-only kernel likewise changes representation, packing
    u8x4 output, rasterize.rs:172-177). Error budget: xy stays FULL f32
    (tile-relative, exactly reconstructible) — an f16 xy's ulp at a
    tile-diagonal offset is ~0.02 px, which for the sub-pixel splats a
    converged model is full of means an O(10%) alpha error (the round-5
    quality eval measured it as dB-level loss); f16 conic is a <= 2^-11
    relative sigma error and f16 rgb/opacity are ~5e-4 relative — both
    well under the 1/255 output quantization step at contributing pixels.
    """
    mx, my, c00, c01, c11, opac, r, g, bch = rows9
    ox, oy = _slot_tile_origin(key, num_tiles, tile_bw)
    return [
        mx - ox,
        my - oy,
        _pack2f16(c00, c01),
        _pack2f16(c11, opac),
        _pack2f16(r, g),
        _pack2f16(bch, jnp.zeros_like(bch)),
    ]


def unpack_fwd_rows(key_sorted, rows6, num_tiles: int, tile_bw: int):
    """Inverse of pack_fwd_rows (to f32, post-rounding values): 6 rows -> 9.
    Sentinel slots decode to garbage xy — they sort past every real tile
    range and are never rasterized."""
    dx, dy = rows6[0], rows6[1]
    c00, c01 = _unpack2f16(rows6[2])
    c11, opac = _unpack2f16(rows6[3])
    r, g = _unpack2f16(rows6[4])
    bch, _ = _unpack2f16(rows6[5])
    ox, oy = _slot_tile_origin(key_sorted, num_tiles, tile_bw)
    return [dx + ox, dy + oy, c00, c01, c11, opac, r, g, bch]


def sort_packed(key, rows):
    """Sort f32 payload `rows` by u32 `key`. Returns (sorted_key,
    sorted_rows).

    Round-5 v5e measurements (MEASUREMENTS_r05.md): with every output
    actually consumed, lax.sort at 6.1M slots costs ~9 ms for the key
    plus ~4.2 ms per payload row — operand dtype and u64 pair-packing
    change nothing (earlier "per-byte" and "payload-flat" cost laws were
    DCE artifacts: a probe that consumes only the sorted key lets XLA
    delete the payload moves entirely). Payloads therefore ride as plain
    f32 operands with no packing math; the comparator only reads the key,
    so payload bit patterns (u16 pairs, depth bits, NaNs) move untouched.
    """
    sorted_ops = jax.lax.sort((key, *rows), num_keys=1, is_stable=False)
    return sorted_ops[0], list(sorted_ops[1:])
