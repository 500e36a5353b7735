"""Decompose the EMISSION cost (the round-4 whale: ~70-80 ms of the frame).

Stages are cumulative: each adds one piece of build_intersections' pre-sort
work. Chained-dependency timing; all stages consume every array they
produce (per-element combine, not just [:1], so XLA cannot DCE operands).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from brush_tpu.camera import Camera
    from brush_tpu.render import camera_inputs
    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops import tiling as T
    from brush_tpu.constants import TILE_WIDTH
    from brush_tpu.utils.synthetic import bench_splats

    n = 1_000_000
    img = (1920, 1080)
    cam = Camera(position=np.array([0.0, 0.0, -18.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=1.0, fov_y=0.62)
    splats = bench_splats(n, sh_degree=0)
    cam_in = camera_inputs(cam, img)
    k0, rem_cap = plan_caps(splats.means, splats.log_scales, splats.quats,
                            splats.raw_opacities, cam_in, img)
    print(f"k0={k0} rem_cap={rem_cap}", flush=True)
    args = (splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacities)
    img_w, img_h = img
    tile_bw = -(-img_w // TILE_WIDTH)
    num_tiles = tile_bw * (-(-img_h // TILE_WIDTH))

    def chain_time(fn, x0, iters=6, label=""):
        x = fn(x0)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:34s} {dt:9.3f} ms", flush=True)
        return dt

    @jax.jit
    def f0(m):
        return m + 1.0
    chain_time(f0, args[0], label="dispatch_floor")

    def consume1(a):
        # full-array reduction: nothing upstream can be DCE'd
        return jnp.sum(a.astype(jnp.float32) * 1e-9)

    def proj_table(m):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        proj = jax.tree.map(jax.lax.stop_gradient, proj)
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
        return proj, table, hit_mask, counts, pc, depth_bits

    @jax.jit
    def f_table(m):
        _, table, *_ = proj_table(m)
        return m + 0.0 * consume1(table)
    chain_time(f_table, args[0], label="proj+exact_counts+table")

    @jax.jit
    def f_dense_ids(m):
        proj, table, hit_mask, counts, pc, depth_bits = proj_table(m)
        kd = jnp.arange(k0, dtype=jnp.int32)[:, None]
        dense_in = kd < counts[None, :]
        local_d = jnp.where(
            kd < pc[None, :],
            T._select_bit(hit_mask[None, :], jnp.minimum(kd, pc[None, :])),
            T.B_SCAN + kd - pc[None, :])
        bb_w = table[13].astype(jnp.int32)
        tx = table[11].astype(jnp.int32) + local_d % bb_w
        ty = table[12].astype(jnp.int32) + local_d // bb_w
        tile_id_d = jnp.where(dense_in, ty * tile_bw + tx, num_tiles)
        return m + 0.0 * consume1(tile_id_d)
    chain_time(f_dense_ids, args[0], label="+dense tile ids (select_bit)")

    @jax.jit
    def f_expand(m):
        proj, table, hit_mask, counts, pc, depth_bits = proj_table(m)
        rem_counts = jnp.maximum(counts - k0, 0)
        rem_cum = T._cumsum_flat(rem_counts)
        rem_starts = (rem_cum - rem_counts).astype(jnp.int32)
        from brush_tpu.ops.expand_pallas import expand_segments
        tbl19 = jnp.concatenate([
            table,
            (rem_starts % 4096).astype(jnp.float32)[None],
            (rem_starts // 4096).astype(jnp.float32)[None],
        ], axis=0)
        filled = expand_segments(tbl19, rem_starts, rem_counts, rem_cap)
        return m + 0.0 * consume1(filled)
    chain_time(f_expand, args[0], label="+remainder expand_segments")

    # dense payload concat materialization only (no remainder)
    @jax.jit
    def f_densepay(m):
        proj, table, hit_mask, counts, pc, depth_bits = proj_table(m)
        acc = 0.0
        for r in range(9):
            row = jnp.broadcast_to(table[r][None, :], (k0, n)).reshape(-1)
            acc = acc + consume1(row)
        return m + 0.0 * acc
    chain_time(f_densepay, args[0], label="+9 dense payload broadcasts")

    # the real full emission, all outputs consumed elementwise
    @jax.jit
    def f_emit(m):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        isect = T.build_intersections(proj, img, rem_cap, expand_k0=k0)
        return m + 0.0 * (consume1(isect.soa) + consume1(isect.tile_ranges)
                          + consume1(isect.gid_from_isect))
    chain_time(f_emit, args[0], label="full build_intersections")

    # sort with ALL outputs consumed (no DCE possible)
    proj = jax.jit(lambda m: jax.tree.map(
        jax.lax.stop_gradient,
        project_splats(m, *args[1:], cam_in, img, sh_degree=0)))(args[0])
    isect = jax.jit(lambda p: T.build_intersections(
        p, img, rem_cap, expand_k0=k0))(proj)
    s_cap = n * k0 + rem_cap
    key0 = isect.soa[9, :s_cap].astype(jnp.int32) % num_tiles
    rank0 = isect.soa[0, :s_cap]
    pays = [isect.soa[i, :s_cap] for i in range(9)]
    key0 = key0.block_until_ready()

    @jax.jit
    def f_sort12(k):
        ops = jax.lax.sort(
            (k, jax.lax.bitcast_convert_type(rank0, jnp.int32), k, *pays),
            num_keys=2, is_stable=False)
        acc = 0.0
        for o in ops:
            acc = acc + jnp.sum(o.astype(jnp.float32) * 1e-9)
        return k + (0.0 * acc).astype(jnp.int32)
    chain_time(f_sort12, key0, label="sort12 all-consumed")


if __name__ == "__main__":
    main()
