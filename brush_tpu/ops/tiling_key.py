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
