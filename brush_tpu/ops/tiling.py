"""Tile binning: depth sort -> dense+remainder expansion -> payload sort.

Replaces the reference's atomic-compaction + radix-sort machinery
(brush-render/src/render.rs:103-237, kernels/map_gaussians.rs, brush-sort,
brush-prefix-sum, get_tile_offset.rs) with XLA-native equivalents, tuned for
what is actually fast on TPU (measured on v5e):

* visible-set compaction -> one argsort over (+inf-masked) depth keys;
* intersection expansion is SPLIT: the first K0 tile slots of every splat
  are a dense [N, K0] broadcast computed directly from per-splat data (no
  gather at all), and only the excess slots of large splats go through the
  owner-lookup path (scatter-markers + running-max scan). This matters
  because XLA gathers cost per-INDEX (~25-42 ns when owner runs are short):
  at real-scene densities (~2-6 tiles/splat) the owner-gather over every
  slot was the single most expensive op in the renderer;
* the per-slot splat attributes (the rasterizer SoA: xy, conic, opacity,
  rgb, gid) ride the tile sort as payloads — sort payloads move at
  near-bandwidth, unlike the per-index scatter (aligned relayout) + gather
  (SoA build) pair this replaces;
* one `lax.sort` with keys (tile_id, depth_rank): (tile, rank) pairs are
  unique (a splat contributes at most one slot per tile), so no stability
  needed and depth order within tiles is exact (the reference's stable LSD
  radix passes);
* get_tile_offsets -> searchsorted with only T+1 queries (cheap direction).

Capacity model: the sorted space has `N*K0 + isect_cap` slots (`isect_cap`
is the REMAINDER capacity). Tile ranges are raw compact [start, end) —
unaligned; the Pallas kernels read arbitrary-offset chunks via aligned-down
DMA windows + a dynamic lane roll, and the backward writes gradients to a
chunk-indexed buffer (leading-axis offsets are unconstrained), so no
alignment relayout exists anywhere. Slots past the true count get the
sentinel tile id `num_tiles` (map_gaussians.rs:53-57) and sort past every
valid tile. Overflow (excess slots beyond isect_cap, or chunks beyond
chunk_cap) is reported so a host-side wrapper can retry bigger — replacing
the reference's mid-pipeline GPU->CPU count readback (render.rs:146-167).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.projection import ProjectedSplats
from brush_tpu.ops.tiling_key import (
    B_SCAN, combined_key, sort_packed, tile_boundary_keys)

# SoA row layout in `soa` (and in the backward's gradient buffer):
# 0 xy_x, 1 xy_y, 2 conic00, 3 conic01, 4 conic11, 5 opacity, 6..8 rgb,
# 9 gid (exact in f32: gid < 2^24), 10..15 zero padding.
SOA_ROWS = 16
# Forward-only diet SoA (inference/viewer): the 6 diet payload rows of
# pack_fwd_rows, undecoded — rows 0,1 tile-relative f32 xy, 2 (c00,c01),
# 3 (c11,opac), 4 (r,g), 5 (b,0) as u16 pairs, 6..7 zero padding.
# Decoded in-kernel (_decode_diet).
DIET_SOA_ROWS = 8
# Rasterizer chunk length (lanes). Must be a multiple of 256 (the backward's
# chunk-indexed gradient blocks rely on CK-multiple lane offsets satisfying
# Mosaic's 128-lane DMA alignment). Env-overridable for perf experiments.
import os as _os
CK = int(_os.environ.get("BRUSH_TPU_CK", "256"))
assert CK % 256 == 0, CK
LANE_PAD = CK + 128  # soa tail padding so window reads never run off the end

# B_SCAN (exact gaussian-vs-tile test width) lives in ops/tiling_key.py —
# shared with the fused emission kernel. Exact-count emission: removed
# slots are exactly inert by construction (will_contribute failing means
# alpha < 1/255 at every pixel of the tile), but EMISSION COUNTS shrink
# (~25-40%), so the sort, the expansion, and the backward reduce all
# process fewer slots.


class Intersections(NamedTuple):
    num_visible: jnp.ndarray   # [] int32
    num_isects: jnp.ndarray    # [] int32 REMAINDER slots needed — the
    #   overflow predicate is num_isects > isect_cap (dense slots never
    #   overflow; the default chunk_cap bound is safe by construction)
    num_bbox_tail: jnp.ndarray  # [] int32 slots emitted under bbox-tail
    #   semantics (giant splats whose bbox exceeds B_SCAN exact-test slots)
    #   — observability for the exact-emission saving claim: if this is a
    #   large fraction of num_isects the ~25-40% slot reduction is not
    #   being realized on this scene (ops/tiling.py B_SCAN note).
    num_isects_aligned: jnp.ndarray  # [] int32 chunk-space slots used (NC*CK)
    gid_from_isect: jnp.ndarray   # [S] global splat id per sorted slot
    tile_ranges: jnp.ndarray   # [T,2] raw (start, end) in sorted order
    soa: jnp.ndarray           # [16, S + LANE_PAD] f32 rasterizer SoA
    chunk_starts: jnp.ndarray  # [T] int32 exclusive cumsum of per-tile chunks
    num_chunks: jnp.ndarray    # [] int32 total chunks used
    # After a sort of per-slot gradients by global gid, splat g's surviving
    # slots occupy [surv_starts_g[g], +surv_counts_g[g]) — known boundaries
    # (computed here pre-sort) that make the backward reduce a cumsum
    # difference with no boundary extraction.
    surv_starts_g: jnp.ndarray  # [N] sorted-order segment start, global order
    surv_counts_g: jnp.ndarray  # [N] surviving slots per splat, global order


def will_contribute(
    tile_x: jnp.ndarray,
    tile_y: jnp.ndarray,
    mx: jnp.ndarray,
    my: jnp.ndarray,
    c00: jnp.ndarray,
    c01: jnp.ndarray,
    c11: jnp.ndarray,
    power_threshold: jnp.ndarray,
) -> jnp.ndarray:
    """Exact (conservative) gaussian-vs-tile test, StopThePop style
    (helpers.rs will_primitive_contribute:223-260). All args broadcast."""
    tw = float(TILE_WIDTH)
    min_x = tile_x.astype(jnp.float32) * tw
    min_y = tile_y.astype(jnp.float32) * tw
    max_x = min_x + tw
    max_y = min_y + tw

    x_left = mx < min_x
    x_right = mx > max_x
    in_x = ~(x_left | x_right)
    y_above = my < min_y
    y_below = my > max_y
    in_y = ~(y_above | y_below)

    corner_x = jnp.where(x_left, min_x, max_x)
    corner_y = jnp.where(y_above, min_y, max_y)
    dxf = jnp.where(x_left, tw, -tw)
    dyf = jnp.where(y_above, tw, -tw)
    diff_x = mx - corner_x
    diff_y = my - corner_y

    tx_den = dxf * c00 * dxf
    ty_den = dyf * c11 * dyf
    tx_raw = (dxf * c00 * diff_x + dxf * c01 * diff_y) / jnp.where(tx_den != 0, tx_den, 1.0)
    ty_raw = (dyf * c01 * diff_x + dyf * c11 * diff_y) / jnp.where(ty_den != 0, ty_den, 1.0)
    tx = jnp.where(in_y, 0.0, jnp.clip(tx_raw, 0.0, 1.0))
    ty = jnp.where(in_x, 0.0, jnp.clip(ty_raw, 0.0, 1.0))

    px = corner_x + tx * dxf
    py = corner_y + ty * dyf
    ddx = px - mx
    ddy = py - my
    sigma = 0.5 * (c00 * ddx * ddx + c11 * ddy * ddy) + c01 * ddx * ddy
    return (in_x & in_y) | (sigma <= power_threshold)


def _power_threshold(opac):
    """ln(255*opac), the alpha-cutoff iso-level (project_forward.rs:96).
    One shared definition so the emission-time exact test and the
    emitted-count pass agree bitwise."""
    return jnp.log(jnp.maximum(opac, 1e-30) * 255.0)


def exact_tile_counts(proj):
    """Per-splat exact-hit bitmask over the first B_SCAN bbox-local slots
    and the exact emission count.

    Returns (mask [N] uint32, counts_x [N] int32) where bit j of mask says
    bbox-local slot j passes the exact gaussian-vs-tile test, and
    counts_x = popcount(mask) + max(bbox_count - B_SCAN, 0) — passing
    locals < B_SCAN plus the untested bbox tail of giant splats. Shared by
    the emission pipeline and the capacity planner so both count the same
    slots bitwise."""
    counts_bb = proj.num_tiles_bbox.astype(jnp.int32)
    jloc = jnp.arange(B_SCAN, dtype=jnp.int32)[None, :]
    bb_w = jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1)[:, None]
    tx = proj.tile_min[:, 0:1] + jloc % bb_w
    ty = proj.tile_min[:, 1:2] + jloc // bb_w
    hit = will_contribute(
        tx, ty, proj.mean2d[:, 0:1], proj.mean2d[:, 1:2],
        proj.conic[:, 0:1], proj.conic[:, 1:2], proj.conic[:, 2:3],
        _power_threshold(proj.opac)[:, None])
    hit = hit & (jloc < jnp.minimum(counts_bb, B_SCAN)[:, None])
    mask = jnp.sum(hit.astype(jnp.uint32)
                   << jnp.arange(B_SCAN, dtype=jnp.uint32)[None, :],
                   axis=1, dtype=jnp.uint32)
    pc = jax.lax.population_count(mask).astype(jnp.int32)
    counts_x = pc + jnp.maximum(counts_bb - B_SCAN, 0)
    return mask, counts_x


def _select_bit(mask_u32, j):
    """Vectorized position of the j-th (0-based) set bit of each uint32;
    callers guarantee j < popcount(mask). The 32-step unrolled scan fuses
    into one elementwise pass — there is no gather anywhere."""
    cnt = jnp.zeros_like(j)
    pos = jnp.zeros_like(j)
    for b in range(B_SCAN):
        bit = ((mask_u32 >> jnp.uint32(b)) & jnp.uint32(1)).astype(j.dtype)
        here = (bit == 1) & (cnt == j)
        pos = jnp.where(here, b, pos)
        cnt = cnt + bit
    return pos


def _cumsum_flat(x):
    """Inclusive 1-D prefix sum: Pallas carry-scan on TPU, jnp.cumsum on CPU
    (associative_scan's recursive form compiles pathologically on TPU at 8M;
    the carry-scan is one HBM pass)."""
    if jax.default_backend() != "cpu":
        from brush_tpu.ops.scan_pallas import cumsum_rows
        return cumsum_rows(x[None, :])[0]
    return jnp.cumsum(x)


def _cummax_flat(x):
    """Inclusive running max. On TPU: the Pallas carry-scan kernel (one HBM
    pass, ~4 ms at 8M vs ~23 ms for a ladder). On CPU (tests): a flat
    Hillis-Steele shift+max ladder."""
    if jax.default_backend() != "cpu":
        from brush_tpu.ops.scan_pallas import cummax_1d
        return cummax_1d(x)
    n = x.shape[0]
    lo = jnp.iinfo(x.dtype).min
    s = 1
    while s < n:
        shifted = jnp.concatenate([jnp.full((s,), lo, x.dtype), x[:-s]])
        x = jnp.maximum(x, shifted)
        s *= 2
    return x




def build_intersections(
    proj: ProjectedSplats,
    img_size: tuple[int, int],
    isect_cap: int,
    expand_k0: int = 4,
    chunk_cap: int | None = None,
    with_bwd_info: bool = True,
) -> Intersections:
    # Binning decisions and the rasterizer SoA carry no gradient: parameter
    # cotangents are manufactured by the rasterizer's custom VJP (per-splat,
    # global order), exactly like the reference's hand-written backward.
    proj = jax.tree.map(jax.lax.stop_gradient, proj)
    img_w, img_h = img_size
    tile_bw = -(-img_w // TILE_WIDTH)
    tile_bh = -(-img_h // TILE_WIDTH)
    num_tiles = tile_bw * tile_bh
    n = proj.depth.shape[0]
    k0 = max(int(expand_k0), 1)
    rem_cap = isect_cap
    del chunk_cap  # backward gradient capacity is resolved by the caller

    num_visible = jnp.sum(proj.visible).astype(jnp.int32)

    # Everything runs in GLOBAL splat order: depth ordering comes from the
    # sort KEY, not from a pre-permutation. Positive-float bit patterns are
    # order-preserving as unsigned ints, so the depth key is a free bitcast
    # — this removes the depth argsort and every per-index permutation
    # gather/scatter the compact-order formulation needed. Culled splats
    # have num_tiles_bbox == 0 (projection.py) and expand to nothing.
    #
    # EXACT-COUNT EMISSION: slot budgets use the exact gaussian-vs-tile
    # counts (StopThePop skip, map_gaussians.rs:62-75), not bbox counts —
    # per-splat slot k decodes to the k-th PASSING bbox tile via the hit
    # bitmask, so non-contributing pairs never enter the sort at all
    # (~25-40% fewer slots through sort + expansion + backward reduce,
    # bitwise-identical images: a failed tile has alpha < 1/255 at every
    # pixel). Locals >= B_SCAN (giant splats) keep bbox semantics.
    hit_mask, counts = exact_tile_counts(proj)             # [N] u32, [N] i32
    pc = jax.lax.population_count(hit_mask).astype(jnp.int32)
    num_bbox_tail = jnp.sum(counts - pc).astype(jnp.int32)
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 0.0), jnp.int32)

    # Per-splat attribute rows, global order. Floats carry the small ints
    # exactly (gid < 2^24, tile coords < 2^12, mask limbs < 2^16); the
    # depth key rides as a raw bit pattern (row 10) — gathers preserve
    # bits, so it bitcasts back. Kept as a ROW LIST: the TPU path stacks
    # them inside the emission kernel's Pallas row stack (XLA's strided
    # [17, 1M] stack measured ~8 ms); only the CPU oracle materializes the
    # matrix.
    table_rows = [
        proj.mean2d[:, 0], proj.mean2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.opac,
        proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
        jnp.arange(n, dtype=jnp.float32),                  # gid
        jax.lax.bitcast_convert_type(depth_bits, jnp.float32),
        proj.tile_min[:, 0].astype(jnp.float32),
        proj.tile_min[:, 1].astype(jnp.float32),
        jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1
                    ).astype(jnp.float32),
        counts.astype(jnp.float32),                        # EXACT slot count
        (hit_mask & jnp.uint32(0xFFFF)).astype(jnp.float32),
        (hit_mask >> jnp.uint32(16)).astype(jnp.float32),
    ]                                                      # 17 x [N]

    # --- remainder bookkeeping (shared by both emission paths) ---
    rem_counts = jnp.maximum(counts - k0, 0)
    rem_cum = _cumsum_flat(rem_counts)
    rem_needed = rem_cum[-1].astype(jnp.int32)
    rem_starts = (rem_cum - rem_counts).astype(jnp.int32)

    if jax.default_backend() == "cpu":
        # Test/oracle path: plain jnp emission (owner lookup by binary
        # search + gather — fine on CPU), k-major dense + remainder.
        key, rows10, s_cap, eff_rem_cap = _emit_jnp(
            jnp.stack(table_rows, axis=0), hit_mask, counts, pc,
            depth_bits, rem_starts, rem_needed, n, k0, rem_cap, tile_bw,
            num_tiles)
    else:
        # Production path: the fused emission kernel writes the sort
        # operands in ONE pass (ops/emit_pallas.py) — the separate
        # broadcasts/expansion/decodes/concats cost ~18 ms/frame as XLA
        # ops. Round 5: the kernel emits ONE matrix (row 0 = key bits,
        # 1..9 payload, 10 gid); row slices feed the sort.
        from brush_tpu.ops.emit_pallas import emit_sizes, emit_slots
        emat = emit_slots(table_rows, rem_starts, k0, rem_cap, img_size)
        key = (emat[0].astype(jnp.uint32)
               | (emat[11].astype(jnp.uint32) << jnp.uint32(16)))
        rows10 = [emat[r] for r in range(1, 11)]
        # The kernel's remainder region is BLKS-padded; runs truncate at
        # its edge, so surviving-slot counts use the padded capacity.
        # Sizes come from the STATIC helper — emit_slots is jitted and
        # would hand back traced scalars.
        s_cap, _, eff_rem_cap = emit_sizes(n, k0, rem_cap)

    # ONE u32 sort key (tile | truncated depth) + bit-packed payload
    # operands — the measured cost law is per-BYTE (ops/tiling_key.py).
    # gid rides as the 10th payload row ONLY when the backward needs it
    # (the reference's bwd_info comptime split, rasterize.rs:172-177).
    # Forward-only rendering additionally diets the payload to u16
    # precision (tile-relative f16 xy, f16 conic/rgb/opacity): 2 u64 +
    # 1 u32 operands instead of 4 u64 + 1 u32 — sub-quantization error for
    # the viewer path, ~16 ms/frame of sort traffic at 6M slots.
    # Ties (depths equal in kept bits) resolve deterministically by XLA's
    # fixed sorting network; the golden suites gate this approximation.
    if with_bwd_info:
        key_sorted, rows_sorted = sort_packed(key, rows10)
        gid_from_isect = rows_sorted[9].astype(jnp.int32)
        soa_rows = SOA_ROWS
    else:
        from brush_tpu.ops.tiling_key import pack_fwd_rows
        key_sorted, packed_sorted = sort_packed(
            key, pack_fwd_rows(key, rows10[:9], num_tiles, tile_bw))
        # The 6 diet rows go STRAIGHT into the diet SoA — no XLA
        # unpack pass, half the stack width, half the rasterizer input
        # bandwidth. The fwd kernel decodes the pairs per chunk with the
        # bit-exact equivalent of XLA's f16->f32 (rasterize_pallas
        # _f16_to_f32), so pixels stay bitwise identical to the unpacked
        # pipeline.
        rows_sorted = packed_sorted
        gid_from_isect = jnp.zeros((0,), jnp.int32)
        soa_rows = DIET_SOA_ROWS

    # Assemble the kernel SoA with the block-pipelined Pallas stack (XLA's
    # own 1-D-rows -> matrix stack measured ~280 ms at 24M lanes); the tail
    # past s_cap is unspecified garbage, which the kernels' span masks make
    # inert, and the width rounds up past LANE_PAD so window DMAs stay
    # in bounds.
    from brush_tpu.ops.scan_pallas import stack_rows
    soa = stack_rows(rows_sorted, soa_rows, s_cap + LANE_PAD)

    bounds = jnp.searchsorted(
        key_sorted, tile_boundary_keys(num_tiles),
        side="left").astype(jnp.int32)         # T+1 queries: cheap direction
    counts_t = bounds[1:] - bounds[:-1]        # [T]
    tile_ranges = jnp.stack([bounds[:-1], bounds[1:]], axis=-1)

    nchunks = (counts_t + CK - 1) // CK
    ccum = jnp.cumsum(nchunks)
    num_chunks = ccum[-1].astype(jnp.int32)
    chunk_starts = (ccum - nchunks).astype(jnp.int32)

    # Per-splat surviving-slot counts for the backward's sorted-order
    # segment reduce: every emitted slot lands in a REAL tile's range
    # (exact-count emission — non-contributing pairs were never emitted),
    # EXCEPT remainder slots truncated by remainder-capacity overflow, so
    # the emitted count is just the exact count clipped to each splat's
    # available remainder room (eff_rem_cap = the emission path's true
    # remainder width: rem_cap on the jnp path, BLKS-padded in the kernel).
    # Forward-only rendering has no backward reduce — skip the cumsum.
    if with_bwd_info:
        avail_rem = jnp.clip(eff_rem_cap - rem_starts, 0, None)
        emitted = jnp.minimum(counts, k0 + avail_rem)
        gcum = _cumsum_flat(emitted)
        surv_starts_g = (gcum - emitted).astype(jnp.int32)
    else:
        emitted = jnp.zeros((0,), jnp.int32)
        surv_starts_g = jnp.zeros((0,), jnp.int32)

    return Intersections(
        num_visible=num_visible,
        num_isects=rem_needed,
        num_bbox_tail=num_bbox_tail,
        num_isects_aligned=(num_chunks * CK).astype(jnp.int32),
        gid_from_isect=gid_from_isect,
        tile_ranges=tile_ranges,
        soa=soa,
        chunk_starts=chunk_starts,
        num_chunks=num_chunks,
        surv_starts_g=surv_starts_g,
        surv_counts_g=emitted.astype(jnp.int32),
    )


def _emit_jnp(table, hit_mask, counts, pc, depth_bits, rem_starts,
              rem_needed, n, k0, rem_cap, tile_bw, num_tiles):
    """jnp slot emission (CPU oracle for ops/emit_pallas.emit_slots).

    Dense region k-major [K0, N] + remainder region [rem_cap]. Returns
    (combined key u32 [S], 10 payload rows f32 [S] (xy, conic, opac, rgb,
    gid), s_cap, eff_rem_cap)."""

    def tile_of(vals, local, in_range):
        bb_w = jnp.maximum(vals[13].astype(jnp.int32), 1)
        tx = vals[11].astype(jnp.int32) + local % bb_w
        ty = vals[12].astype(jnp.int32) + local // bb_w
        return jnp.where(in_range, ty * tile_bw + tx, num_tiles)

    def decode_local(mask, pcnt, j):
        """Bbox-local index of a splat's j-th emitted slot: the j-th set
        mask bit for j < popcount, else the bbox tail past B_SCAN."""
        return jnp.where(j < pcnt, _select_bit(mask, jnp.minimum(j, pcnt)),
                         B_SCAN + j - pcnt)

    # --- dense part: slots k < min(count, K0), pure per-splat broadcast ---
    kd = jnp.arange(k0, dtype=jnp.int32)[:, None]          # [K0, 1]
    dense_in = kd < counts[None, :]                        # [K0, N]
    local_d = decode_local(hit_mask[None, :], pc[None, :], kd)
    tile_id_d = tile_of(table[:, None, :], local_d, dense_in)  # [K0, N]
    rank_d = jnp.broadcast_to(depth_bits[None, :], (k0, n))

    # --- remainder: slots k >= K0 of large splats, owner lookup ---
    rem_slots = jnp.arange(rem_cap, dtype=jnp.int32)
    owner = jnp.clip(jnp.searchsorted(
        rem_starts, rem_slots, side="right").astype(jnp.int32) - 1,
        0, n - 1)
    vals_r = table[:, owner]                               # [17, R]
    rem_counts_o = jnp.maximum(vals_r[14].astype(jnp.int32) - k0, 0)
    start_r = jnp.where(rem_counts_o > 0, rem_starts[owner], rem_cap)
    j_r = k0 + (rem_slots - start_r)
    mask_r = (vals_r[15].astype(jnp.uint32)
              | (vals_r[16].astype(jnp.uint32) << jnp.uint32(16)))
    pc_r = jax.lax.population_count(mask_r).astype(jnp.int32)
    local_r = decode_local(mask_r, pc_r, j_r)
    # On remainder-capacity overflow the start markers of splats past
    # rem_cap are dropped, so trailing slots inherit the last fitting owner
    # with out-of-range emission ranks — the per-owner bound masks those
    # phantom slots to the sentinel tile (the host retry loop is the
    # recovery path; this keeps the truncated state non-corrupting).
    rem_in = ((rem_slots < rem_needed) & (j_r >= 0)
              & (j_r < vals_r[14].astype(jnp.int32)))
    tile_id_r = tile_of(vals_r, local_r, rem_in)
    rank_r = jax.lax.bitcast_convert_type(vals_r[10], jnp.int32)

    tile_id = jnp.concatenate([tile_id_d.reshape(-1), tile_id_r])
    rank = jnp.concatenate([rank_d.reshape(-1), rank_r])
    key = combined_key(tile_id, rank, num_tiles)
    rows10 = [
        jnp.concatenate([
            jnp.broadcast_to(table[r][None, :], (k0, n)).reshape(-1),
            vals_r[r],
        ]) for r in range(9)                               # xy,conic,opac,rgb
    ] + [jnp.concatenate([
        jnp.broadcast_to(table[9][None, :], (k0, n)).reshape(-1),
        vals_r[9],
    ])]                                                    # gid (f32)
    return key, rows10, n * k0 + rem_cap, rem_cap
