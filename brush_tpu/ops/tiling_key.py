"""Shared tile-sort key/packing helpers (used by ops/tiling.py and the
fused emission kernel, which cannot import ops/tiling.py circularly).

Round-4 v5e measurements (benches/microbench_sortshape.py, _sorti64.py)
pinned the tile sort's cost law: ~3.7 ms per OPERAND at 6.3M slots
regardless of operand width (bf16 == f32 == i64 per operand), and one key
is ~5.5 ms cheaper than two. Hence:

  * ONE combined u32 key: tile_id in the top bits, the splat's depth bit
    pattern truncated into the rest. Orders (tile, depth) exactly except
    for depths equal in their kept bits — those tie and resolve by XLA's
    fixed sorting network (deterministic run to run; the golden-image
    suites pass, which is the acceptance bar — the reference's stable
    radix only pins tie order for bitwise-equal full-depth keys).
  * f32 payload PAIRS bit-packed into u64 rows: halves the payload operand
    count. Packing is bit-exact (pure bitcasts); the u64 values are
    meaningless as numbers and are never compared.

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


def pack_pairs_u64(rows):
    """Bit-pack consecutive f32 row pairs into u64 rows (lo = even row).
    An odd trailing row stays a plain u32 operand (sort cost is per BYTE —
    padding it to u64 would buy nothing and cost half an operand). Trace
    under jax.enable_x64()."""
    rows = list(rows)
    out = []
    for i in range(0, len(rows) - 1, 2):
        lo = jax.lax.bitcast_convert_type(rows[i], jnp.uint32
                                          ).astype(jnp.uint64)
        hi = jax.lax.bitcast_convert_type(rows[i + 1], jnp.uint32
                                          ).astype(jnp.uint64)
        out.append(lo | (hi << jnp.uint64(32)))
    if len(rows) % 2:
        out.append(jax.lax.bitcast_convert_type(rows[-1], jnp.uint32))
    return out


def unpack_pairs_u64(packed, n_rows: int):
    """Inverse of pack_pairs_u64 -> n_rows f32 arrays."""
    rows = []
    for p in packed:
        if p.dtype == jnp.uint32:
            rows.append(jax.lax.bitcast_convert_type(p, jnp.float32))
            continue
        lo = (p & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (p >> jnp.uint64(32)).astype(jnp.uint32)
        rows.append(jax.lax.bitcast_convert_type(lo, jnp.float32))
        rows.append(jax.lax.bitcast_convert_type(hi, jnp.float32))
    return rows[:n_rows]


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
    """Forward-only payload diet: 9 f32 rows -> 5 u16-precision rows, so the
    tile sort carries 2 u64 + 1 u32 payload operands instead of 4 u64 + 1 u32
    (the measured cost law is per BYTE; ~16 ms/frame at 6M slots on v5e).

    Lossy by design — the viewer/inference specialization only (the
    reference's fwd-only kernel likewise changes representation, packing
    u8x4 output, rasterize.rs:172-177). Error budget: xy is stored RELATIVE
    to the slot's emission tile (recovered from the sort key), so the f16
    rounding of (dx, dy) perturbs sigma by <= sigma/1024 at contributing
    pixels (sigma <= ln(255*opac) there); f16 conic is a <= 2^-11 relative
    sigma error; f16 rgb/opacity are ~5e-4 relative — all well under the
    1/255 output quantization step.
    """
    mx, my, c00, c01, c11, opac, r, g, bch = rows9
    ox, oy = _slot_tile_origin(key, num_tiles, tile_bw)
    return [
        _pack2f16(mx - ox, my - oy),
        _pack2f16(c00, c01),
        _pack2f16(c11, opac),
        _pack2f16(r, g),
        _pack2f16(bch, jnp.zeros_like(bch)),
    ]


def unpack_fwd_rows(key_sorted, rows5, num_tiles: int, tile_bw: int):
    """Inverse of pack_fwd_rows (to f32, post-rounding values): 5 rows -> 9.
    Sentinel slots decode to garbage xy — they sort past every real tile
    range and are never rasterized."""
    dx, dy = _unpack2f16(rows5[0])
    c00, c01 = _unpack2f16(rows5[1])
    c11, opac = _unpack2f16(rows5[2])
    r, g = _unpack2f16(rows5[3])
    bch, _ = _unpack2f16(rows5[4])
    ox, oy = _slot_tile_origin(key_sorted, num_tiles, tile_bw)
    return [dx + ox, dy + oy, c00, c01, c11, opac, r, g, bch]


def sort_packed(key, rows):
    """Sort f32 payload `rows` by u32 `key` with pair-packed u64 payload
    operands (half the operand bill). Returns (sorted_key, sorted_rows).
    """
    n_rows = len(rows)
    with jax.enable_x64():
        packed = pack_pairs_u64(rows)
        sorted_ops = jax.lax.sort((key, *packed), num_keys=1,
                                  is_stable=False)
        out_rows = unpack_pairs_u64(sorted_ops[1:], n_rows)
    return sorted_ops[0], out_rows
