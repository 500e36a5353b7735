"""Stage bisection of build_intersections on the real TPU: time prefixes
of the pipeline by consuming progressively more outputs (XLA DCEs the
rest). Identifies where the ~110 ms of non-sort binning cost lives."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def chain_time(fn, x0, iters=5, label=""):
    x = fn(x0)
    _ = float(jax.tree_util.tree_leaves(x)[0].ravel()[0:1].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(jax.tree_util.tree_leaves(x)[0].ravel()[0:1].sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    from brush_tpu.camera import Camera
    from brush_tpu.render import camera_inputs
    from brush_tpu.constants import TILE_WIDTH
    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops import tiling as T
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
    print(f"planned k0={k0} rem_cap={rem_cap} s_cap={n * k0 + rem_cap}",
          flush=True)
    args = (splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacities)
    img_w, img_h = img
    tile_bw = -(-img_w // TILE_WIDTH)
    num_tiles = tile_bw * (-(-img_h // TILE_WIDTH))
    s_cap = n * k0 + rem_cap

    chain_time(jax.jit(lambda x: x + 1.0), args[0], iters=8,
               label="dispatch_floor")

    def stages(m, upto):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        proj = jax.tree.map(jax.lax.stop_gradient, proj)
        counts = proj.num_tiles_bbox.astype(jnp.int32)
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
        ], axis=0)
        if upto == "table":
            return m + 0.0 * table[0, :1]

        def tile_of(vals, local, in_range):
            bb_w = vals[13].astype(jnp.int32)
            tx = vals[11].astype(jnp.int32) + local % bb_w
            ty = vals[12].astype(jnp.int32) + local // bb_w
            pt = T._power_threshold(vals[5])
            hit = T.will_contribute(tx, ty, vals[0], vals[1],
                                    vals[2], vals[3], vals[4], pt)
            keep = in_range & (hit | (local >= T.B_SCAN))
            return jnp.where(keep, ty * tile_bw + tx, num_tiles)

        kd = jnp.arange(k0, dtype=jnp.int32)[None, :]
        dense_in = kd < counts[:, None]
        tile_id_d = tile_of(table[:, :, None], kd, dense_in)
        rank_d = jnp.broadcast_to(depth_bits[:, None], (n, k0))
        gid_d = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                 (n, k0))
        if upto == "dense":
            return m + 0.0 * (tile_id_d[0, :1] + rank_d[0, :1]
                              + gid_d[0, :1]).astype(jnp.float32)

        rem_counts = jnp.maximum(counts - k0, 0)
        rem_cum = T._cumsum_flat(rem_counts)
        rem_starts = (rem_cum - rem_counts).astype(jnp.int32)
        if upto == "cumsum":
            return m + 0.0 * rem_starts[:1].astype(jnp.float32)

        from brush_tpu.ops.expand_pallas import expand_segments
        tbl17 = jnp.concatenate([
            table,
            (rem_starts % 4096).astype(jnp.float32)[None],
            (rem_starts // 4096).astype(jnp.float32)[None],
        ], axis=0)
        filled = expand_segments(tbl17, rem_starts, rem_counts, rem_cap)
        vals_r = filled[:15]
        start_r = (filled[15].astype(jnp.int32)
                   + filled[16].astype(jnp.int32) * 4096)
        if upto == "expand":
            return m + 0.0 * vals_r[0, :1]

        rem_slots = jnp.arange(rem_cap, dtype=jnp.int32)
        local_r = k0 + (rem_slots - start_r)
        rem_in = ((rem_slots < rem_cum[-1].astype(jnp.int32))
                  & (local_r < vals_r[14].astype(jnp.int32)))
        tile_id_r = tile_of(vals_r, local_r, rem_in)
        rank_r = jax.lax.bitcast_convert_type(vals_r[10], jnp.int32)
        gid_r = vals_r[9].astype(jnp.int32)
        if upto == "remrows":
            return m + 0.0 * (tile_id_r[:1] + rank_r[:1]
                              + gid_r[:1]).astype(jnp.float32)

        tile_id = jnp.concatenate([tile_id_d.reshape(-1), tile_id_r])
        rank = jnp.concatenate([rank_d.reshape(-1), rank_r])
        gid_all = jnp.concatenate([gid_d.reshape(-1), gid_r])
        payload = [
            jnp.concatenate([
                jnp.broadcast_to(table[r][:, None], (n, k0)).reshape(-1),
                vals_r[r],
            ]) for r in range(9)
        ]
        if upto == "concat":
            acc = tile_id[:1] + rank[:1] + gid_all[:1]
            for p in payload:
                acc = acc + p[:1].astype(jnp.int32)
            return m + 0.0 * acc.astype(jnp.float32)

        sorted_ops = jax.lax.sort(
            (tile_id, rank, gid_all, *payload), num_keys=2, is_stable=False)
        if upto == "sort":
            acc = sorted_ops[0][:1]
            for p in sorted_ops[1:]:
                acc = acc + p[:1].astype(jnp.int32)
            return m + 0.0 * acc.astype(jnp.float32)

        from brush_tpu.ops.scan_pallas import stack_rows
        soa = stack_rows(
            list(sorted_ops[3:]) + [sorted_ops[2].astype(jnp.float32)],
            T.SOA_ROWS, s_cap + T.LANE_PAD)
        if upto == "stack":
            return m + 0.0 * soa[0, :1]

        isect = T.build_intersections(proj, img, rem_cap, expand_k0=k0)
        return m + 0.0 * (isect.soa[0, :1] + isect.tile_ranges[0, 0]
                          + isect.surv_starts_g[0].astype(jnp.float32))

    for stage in ("table", "dense", "cumsum", "expand", "remrows",
                  "concat", "sort", "stack", "full"):
        chain_time(jax.jit(lambda m, s=stage: stages(m, s)), args[0],
                   label=f"upto_{stage}")


if __name__ == "__main__":
    main()
