"""Fused emission kernel (ops/emit_pallas.py) vs the jnp oracle emission.

The kernel must emit the same MULTISET of (key, payload..., gid) slots as
ops/tiling._emit_jnp — positions differ (the kernel pads the dense region
to BLKS multiples and the remainder to BLKS), so both sides are sorted by
(key, gid, payload) on the host and compared after dropping sentinels.
"""

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops import tiling as T
from brush_tpu.ops.emit_pallas import emit_slots
from brush_tpu.ops.projection import project_splats
from brush_tpu.ops.tiling_key import tile_key_bits
from brush_tpu.render import camera_inputs


def _emission_inputs(n=700, seed=0, img=(160, 128), k0=2, rem_cap=4096):
    rng = np.random.default_rng(seed)
    means = jnp.asarray(rng.normal(0, 3, (n, 3)), jnp.float32)
    log_scales = jnp.asarray(
        np.log(rng.uniform(0.03, 1.2, (n, 3))), jnp.float32)
    quats = jnp.asarray(rng.normal(0, 1, (n, 4)), jnp.float32)
    sh = jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)), jnp.float32)
    opac = jnp.asarray(rng.normal(0.5, 1.5, (n,)), jnp.float32)
    cam = Camera(position=np.array([0.0, 0.0, -9.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=1.1, fov_y=0.9)
    proj = project_splats(means, log_scales, quats, sh, opac,
                          camera_inputs(cam, img), img, sh_degree=0)
    proj = jax.tree.map(jax.lax.stop_gradient, proj)

    img_w, img_h = img
    tile_bw = -(-img_w // TILE_WIDTH)
    num_tiles = tile_bw * (-(-img_h // TILE_WIDTH))
    hit_mask, counts = T.exact_tile_counts(proj)
    pc = jax.lax.population_count(hit_mask).astype(jnp.int32)
    depth_bits = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 0.0), jnp.int32)
    table = jnp.stack([
        proj.mean2d[:, 0], proj.mean2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.opac,
        proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
        jnp.arange(n, dtype=jnp.float32),
        jax.lax.bitcast_convert_type(depth_bits, jnp.float32),
        proj.tile_min[:, 0].astype(jnp.float32),
        proj.tile_min[:, 1].astype(jnp.float32),
        jnp.maximum(proj.tile_max[:, 0] - proj.tile_min[:, 0], 1
                    ).astype(jnp.float32),
        counts.astype(jnp.float32),
        (hit_mask & jnp.uint32(0xFFFF)).astype(jnp.float32),
        (hit_mask >> jnp.uint32(16)).astype(jnp.float32),
    ], axis=0)
    rem_counts = jnp.maximum(counts - k0, 0)
    rem_cum = jnp.cumsum(rem_counts)
    rem_starts = (rem_cum - rem_counts).astype(jnp.int32)
    rem_needed = rem_cum[-1].astype(jnp.int32)
    return (table, hit_mask, counts, pc, depth_bits, rem_starts,
            rem_needed, n, k0, rem_cap, tile_bw, num_tiles)


def _real_slot_rows(key, rows, num_tiles):
    """(key, payload rows) -> sorted [n_real, 11] array of non-sentinel
    slots for multiset comparison."""
    tb = tile_key_bits(num_tiles)
    key = np.asarray(key, np.uint32)
    real = (key >> np.uint32(32 - tb)) < num_tiles
    cols = [key[real].astype(np.float64)] + [
        np.asarray(r)[real].astype(np.float64) for r in rows]
    m = np.stack(cols, axis=1)
    order = np.lexsort(tuple(m[:, i] for i in reversed(range(m.shape[1]))))
    return m[order]


@pytest.mark.parametrize("seed,k0,rem_cap", [(0, 2, 4096), (1, 1, 8192),
                                             (2, 4, 4096)])
def test_emit_kernel_matches_jnp(seed, k0, rem_cap):
    (table, hit_mask, counts, pc, depth_bits, rem_starts, rem_needed,
     n, k0, rem_cap, tile_bw, num_tiles) = _emission_inputs(
        seed=seed, k0=k0, rem_cap=rem_cap)
    assert int(rem_needed) > 0, "fixture must exercise the remainder path"
    assert int(rem_needed) <= rem_cap

    key_j, rows_j, _, _ = T._emit_jnp(
        table, hit_mask, counts, pc, depth_bits, rem_starts, rem_needed,
        n, k0, rem_cap, tile_bw, num_tiles)

    img_h_tiles = num_tiles // tile_bw
    img = (tile_bw * TILE_WIDTH, img_h_tiles * TILE_WIDTH)
    emat = emit_slots([table[i] for i in range(17)], rem_starts, k0,
                      rem_cap, img, interpret=True)
    key_k = (emat[0].astype(jnp.uint32)
             | (emat[11].astype(jnp.uint32) << jnp.uint32(16)))
    rows_k = [emat[r] for r in range(1, 11)]

    a = _real_slot_rows(key_j, rows_j, num_tiles)
    b = _real_slot_rows(key_k, rows_k, num_tiles)
    assert a.shape == b.shape, (a.shape, b.shape)
    np.testing.assert_array_equal(a, b)


def test_emit_kernel_giant_splat_tail():
    """Splats with counts past B_SCAN keep bbox-tail semantics in both
    paths (ops/tiling.py B_SCAN notes)."""
    (table, hit_mask, counts, pc, depth_bits, rem_starts, rem_needed,
     n, k0, rem_cap, tile_bw, num_tiles) = _emission_inputs(
        n=40, seed=3, img=(512, 512), k0=1, rem_cap=1 << 14)
    # widen a few splats so bbox counts exceed B_SCAN
    assert int(jnp.max(counts)) >= 1

    key_j, rows_j, _, _ = T._emit_jnp(
        table, hit_mask, counts, pc, depth_bits, rem_starts, rem_needed,
        n, k0, rem_cap, tile_bw, num_tiles)
    img = (512, 512)
    emat = emit_slots([table[i] for i in range(17)], rem_starts, k0,
                      rem_cap, img, interpret=True)
    key_k = (emat[0].astype(jnp.uint32)
             | (emat[11].astype(jnp.uint32) << jnp.uint32(16)))
    a = _real_slot_rows(key_j, rows_j, num_tiles)
    b = _real_slot_rows(key_k, [emat[r] for r in range(1, 11)], num_tiles)
    np.testing.assert_array_equal(a, b)
