"""Fine-grained binning split on the real TPU: emission -> sort -> stack.

Chained-dependency timing (the axon tunnel's dispatch floor ~7 ms must be
subtracted; block_until_ready alone can lie). Each stage function consumes
its predecessor's outputs so XLA cannot DCE the work.
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
    from brush_tpu.render import RenderConfig, camera_inputs
    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops import tiling as T
    from brush_tpu.ops.tiling import CK, SOA_ROWS, LANE_PAD
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
    s_cap = n * k0 + rem_cap
    print(f"k0={k0} rem_cap={rem_cap} s_cap={s_cap}", flush=True)
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

    def emission(m):
        """Everything in build_intersections up to (but excluding) the sort.
        Returns the sort inputs."""
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

        def tile_of(vals, local, in_range):
            bb_w = vals[13].astype(jnp.int32)
            tx = vals[11].astype(jnp.int32) + local % bb_w
            ty = vals[12].astype(jnp.int32) + local // bb_w
            return jnp.where(in_range, ty * tile_bw + tx, num_tiles)

        def decode_local(mask, pcnt, j):
            return jnp.where(
                j < pcnt, T._select_bit(mask, jnp.minimum(j, pcnt)),
                T.B_SCAN + j - pcnt)

        kd = jnp.arange(k0, dtype=jnp.int32)[:, None]
        dense_in = kd < counts[None, :]
        local_d = decode_local(hit_mask[None, :], pc[None, :], kd)
        tile_id_d = tile_of(table[:, None, :], local_d, dense_in)
        rank_d = jnp.broadcast_to(depth_bits[None, :], (k0, n))
        gid_d = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :],
                                 (k0, n))
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
        vals_r = filled[:17]
        start_r = (filled[17].astype(jnp.int32)
                   + filled[18].astype(jnp.int32) * 4096)
        rem_slots = jnp.arange(rem_cap, dtype=jnp.int32)
        j_r = k0 + (rem_slots - start_r)
        mask_r = (vals_r[15].astype(jnp.uint32)
                  | (vals_r[16].astype(jnp.uint32) << jnp.uint32(16)))
        pc_r = jax.lax.population_count(mask_r).astype(jnp.int32)
        local_r = decode_local(mask_r, pc_r, j_r)
        rem_needed = rem_cum[-1].astype(jnp.int32)
        rem_in = ((rem_slots < rem_needed) & (j_r >= 0)
                  & (j_r < vals_r[14].astype(jnp.int32)))
        tile_id_r = tile_of(vals_r, local_r, rem_in)
        rank_r = jax.lax.bitcast_convert_type(vals_r[10], jnp.int32)
        gid_r = vals_r[9].astype(jnp.int32)

        tile_id = jnp.concatenate([tile_id_d.reshape(-1), tile_id_r])
        rank = jnp.concatenate([rank_d.reshape(-1), rank_r])
        gid_all = jnp.concatenate([gid_d.reshape(-1), gid_r])
        payload = [
            jnp.concatenate([
                jnp.broadcast_to(table[r][None, :], (k0, n)).reshape(-1),
                vals_r[r],
            ]) for r in range(9)
        ]
        return (tile_id, rank, gid_all, *payload)

    @jax.jit
    def femit(m):
        outs = emission(m)
        acc = 0.0
        for o in outs:
            acc = acc + o[:1].astype(jnp.float32)
        return m + 0.0 * acc

    chain_time(femit, args[0], label="emission(nosort)")

    # sort isolated: feed frozen emission outputs, jitter key to defeat cache
    emitted = jax.jit(emission)(args[0])
    emitted = jax.tree.map(lambda x: x.block_until_ready(), list(emitted))

    @jax.jit
    def fsort(t0_):
        ops = jax.lax.sort((t0_, *emitted[1:]), num_keys=2, is_stable=False)
        return t0_ + ops[0][:1] * 0 + ops[3][:1].astype(jnp.int32) * 0

    chain_time(fsort, emitted[0], label="sort12(isolated)")

    @jax.jit
    def fsort3(t0_):
        ops = jax.lax.sort((t0_, emitted[1], emitted[2]), num_keys=2,
                           is_stable=False)
        return t0_ + ops[0][:1] * 0 + ops[2][:1] * 0

    chain_time(fsort3, emitted[0], label="sort3(keys+gid only)")

    # stack isolated
    from brush_tpu.ops.scan_pallas import stack_rows
    sorted_ops = jax.jit(lambda t: jax.lax.sort(
        (t, *emitted[1:]), num_keys=2, is_stable=False))(emitted[0])
    rows_in = [sorted_ops[i] for i in range(3, 12)] + [
        sorted_ops[2].astype(jnp.float32)]

    @jax.jit
    def fstack(r0):
        soa = stack_rows([r0] + rows_in[1:], SOA_ROWS, s_cap + LANE_PAD)
        return r0 + 0.0 * soa[0, :1]

    chain_time(fstack, rows_in[0], label="stack_rows(isolated)")

    # searchsorted + chunk bookkeeping
    tile_sorted = sorted_ops[0]

    @jax.jit
    def fbounds(t):
        bounds = jnp.searchsorted(
            t, jnp.arange(num_tiles + 1, dtype=t.dtype),
            side="left").astype(jnp.int32)
        return t + bounds[:1] * 0

    chain_time(fbounds, tile_sorted, label="searchsorted(isolated)")

    # full binning for reference
    @jax.jit
    def fbin(m):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        isect = T.build_intersections(proj, img, rem_cap, expand_k0=k0)
        return m + 0.0 * isect.soa[0, :1]

    chain_time(fbin, args[0], label="proj+binning(full)")


if __name__ == "__main__":
    main()
