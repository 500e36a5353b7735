"""Tile binning: depth sort -> intersection expansion -> tile sort -> ranges.

Replaces the reference's atomic-compaction + radix-sort machinery
(brush-render/src/render.rs:103-237, kernels/map_gaussians.rs,
brush-sort, brush-prefix-sum, get_tile_offset.rs) with the XLA-native
equivalents recommended in SURVEY.md §2.1 notes:

* visible-set compaction -> one `argsort` over (+inf-masked) depth keys;
* GPU prefix sum -> `jnp.cumsum`;
* scatter-style intersection expansion -> a *gather*: each of the
  `isect_cap` intersection slots finds its owning splat with
  `searchsorted` over the cumulative tile counts (no atomics needed);
* the second radix sort -> one stable `argsort` over tile ids (stability
  preserves the depth order within each tile, exactly like the
  reference's stable LSD radix sort);
* `get_tile_offsets` -> `searchsorted` of each tile id over the sorted keys.

Capacity model: `isect_cap` is a static padded capacity. Slots past the true
intersection count, and bbox tiles failing the exact StopThePop
tile-ellipse test (helpers.rs:223-260), get the sentinel tile id
`num_tiles` (map_gaussians.rs:53-57) which sorts past every valid tile and
is never rasterized. The true count is returned so a host-side wrapper can
detect overflow and retry with a larger capacity (replaces the reference's
mid-pipeline GPU->CPU count readback, render.rs:146-167).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.projection import ProjectedSplats


class Intersections(NamedTuple):
    perm: jnp.ndarray          # [N] depth-sorted order: compact -> global gid
    num_visible: jnp.ndarray   # [] int32
    num_isects: jnp.ndarray    # [] int32 true intersection count
    num_isects_aligned: jnp.ndarray  # [] int32 slots used incl. alignment pad
    gid_from_isect: jnp.ndarray   # [I] global splat id per isect slot
    isect_valid: jnp.ndarray   # [I] bool — False for alignment-padding slots
    tile_ranges: jnp.ndarray   # [T,2] (start, start+count); starts ALIGN-aligned


# Each tile's isect range starts at a multiple of ALIGN and owns the whole
# aligned span up to the next tile's start. This guarantees the Pallas
# kernels' fixed-size chunks never cross tile boundaries, so the backward
# kernel can store per-intersection gradients with plain (race-free) DMA
# writes — the TPU substitute for the reference's atomic gradient adds
# (rasterize_backwards.rs HfAtomicAdd/CasAtomicAdd). Padding slots are
# marked invalid and get their alpha zeroed in the SoA, making them inert.
ALIGN = 256


def will_contribute(
    tile_x: jnp.ndarray,
    tile_y: jnp.ndarray,
    mx: jnp.ndarray,
    my: jnp.ndarray,
    conic: jnp.ndarray,  # [..., 3]
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

    c00, c01, c11 = conic[..., 0], conic[..., 1], conic[..., 2]
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


def build_intersections(
    proj: ProjectedSplats,
    img_size: tuple[int, int],
    isect_cap: int,
) -> Intersections:
    img_w, img_h = img_size
    tile_bw = -(-img_w // TILE_WIDTH)
    tile_bh = -(-img_h // TILE_WIDTH)
    num_tiles = tile_bw * tile_bh
    n = proj.depth.shape[0]

    # Depth "compaction": culled splats get +inf keys and sort to the end.
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    perm = jnp.argsort(depth_key)  # compact -> global
    num_visible = jnp.sum(proj.visible).astype(jnp.int32)

    counts_c = proj.num_tiles_bbox[perm]
    cum = jnp.cumsum(counts_c)
    num_isects = cum[-1].astype(jnp.int32)

    # Expansion by gather: slot i belongs to the first compact splat whose
    # cumulative count exceeds i.
    slots = jnp.arange(isect_cap, dtype=jnp.int32)
    owner = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    owner_cl = jnp.minimum(owner, n - 1)
    start = (cum[owner_cl] - counts_c[owner_cl]).astype(jnp.int32)
    local = slots - start
    gid = perm[owner_cl].astype(jnp.int32)

    bb_min = proj.tile_min[gid]
    bb_w = jnp.maximum(proj.tile_max[gid, 0] - bb_min[:, 0], 1)
    tx = bb_min[:, 0] + local % bb_w
    ty = bb_min[:, 1] + local // bb_w

    in_range = slots < num_isects
    contrib = will_contribute(
        tx, ty,
        proj.mean2d[gid, 0], proj.mean2d[gid, 1],
        proj.conic[gid], proj.power_threshold[gid],
    )
    tile_id = jnp.where(in_range & contrib, ty * tile_bw + tx, num_tiles)

    # Stable sort keeps depth order within each tile (slots were generated in
    # depth-compact order).
    order = jnp.argsort(tile_id, stable=True)
    tile_sorted = tile_id[order]
    gid_sorted = gid[order]

    bounds = jnp.searchsorted(
        tile_sorted, jnp.arange(num_tiles + 1, dtype=tile_sorted.dtype), side="left"
    ).astype(jnp.int32)
    counts = bounds[1:] - bounds[:-1]                       # [T]

    # --- Re-layout with ALIGN-aligned per-tile starts (see ALIGN above) ---
    aligned_counts = ((counts + ALIGN - 1) // ALIGN) * ALIGN
    acum = jnp.cumsum(aligned_counts)
    astart = (acum - aligned_counts).astype(jnp.int32)      # [T]
    num_aligned = acum[-1].astype(jnp.int32)

    # Clamp to capacity: tiles past the cap get empty/truncated ranges.
    astart_cl = jnp.minimum(astart, isect_cap)
    count_cl = jnp.clip(counts, 0, isect_cap - astart_cl)
    tile_ranges = jnp.stack([astart_cl, astart_cl + count_cl], axis=-1)

    slots2 = jnp.arange(isect_cap, dtype=jnp.int32)
    tile2 = jnp.searchsorted(acum, slots2, side="right").astype(jnp.int32)
    tile2_cl = jnp.minimum(tile2, num_tiles - 1)
    within = slots2 - astart[tile2_cl]
    valid2 = (tile2 < num_tiles) & (within < counts[tile2_cl])
    orig = jnp.clip(bounds[tile2_cl] + within, 0, isect_cap - 1)
    gid2 = jnp.where(valid2, gid_sorted[orig], 0)

    return Intersections(
        perm=perm.astype(jnp.int32),
        num_visible=num_visible,
        num_isects=num_isects,
        num_isects_aligned=num_aligned,
        gid_from_isect=gid2,
        isect_valid=valid2,
        tile_ranges=tile_ranges,
    )
