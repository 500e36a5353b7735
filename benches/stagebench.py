"""Per-stage chained timing of the forward pipeline on the real TPU.

The axon tunnel makes naive timing lie (~8 ms fixed dispatch per jit call;
block_until_ready can return early), so every measurement here chains
iterations through a data dependency and fetches a dependent scalar at the
end. Subtract the printed `dispatch_floor` from everything.
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
    from brush_tpu.render import RenderConfig, camera_inputs, render
    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.tiling import build_intersections
    from brush_tpu.ops.rasterize_pallas import (
        rasterize_forward_pallas, tiles_to_image)
    from brush_tpu.utils.synthetic import bench_splats

    n_splats = 1_000_000
    img = (1920, 1080)
    cam = Camera(position=np.array([0.0, 0.0, -18.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=1.0, fov_y=0.62)
    splats = bench_splats(n_splats, sh_degree=0)
    cam_in = camera_inputs(cam, img)
    k0, rem_cap = plan_caps(splats.means, splats.log_scales, splats.quats,
                            splats.raw_opacities, cam_in, img)
    print(f"planned k0={k0} rem_cap={rem_cap} "
          f"s_cap={n_splats * k0 + rem_cap}", flush=True)
    rcfg = RenderConfig(img_size=img, sh_degree=0, isect_cap=rem_cap,
                        expand_k0=k0, use_pallas=True)
    bg = jnp.zeros(3, jnp.float32)
    args = (splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacities)

    def chain_time(fn, x0, iters=6, label=""):
        x = fn(x0)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:28s} {dt:9.3f} ms", flush=True)
        return dt

    # dispatch floor
    @jax.jit
    def f0(m):
        return m + 1.0
    chain_time(f0, args[0], label="dispatch_floor")

    # stage 1: projection (chain: perturb means by output-dependent epsilon)
    @jax.jit
    def fproj(m):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        return m + 0.0 * proj.depth[:, None]
    chain_time(fproj, args[0], label="projection")

    # stage 2: projection + binning
    @jax.jit
    def fbin(m):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        isect = build_intersections(proj, img, rcfg.isect_cap,
                                    expand_k0=rcfg.expand_k0)
        return m + 0.0 * isect.soa[0, :1]
    chain_time(fbin, args[0], label="proj+binning")

    # stage 3: full forward
    @jax.jit
    def ffull(m):
        out, _ = render(m, *args[1:], cam_in, bg, rcfg)
        return m + 0.0 * out[0, 0, 0]
    chain_time(ffull, args[0], label="full_forward")

    # binning sub-stages: expansion only (stop before the sort)
    from brush_tpu.constants import TILE_WIDTH
    from brush_tpu.ops import tiling as T

    @jax.jit
    def fexp(m):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        proj = jax.tree.map(jax.lax.stop_gradient, proj)
        img_w, img_h = img
        tile_bw = -(-img_w // TILE_WIDTH)
        num_tiles = tile_bw * (-(-img_h // TILE_WIDTH))
        n = proj.depth.shape[0]
        k0_ = rcfg.expand_k0
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

        def tile_of(vals, local, in_range):
            bb_w = vals[13].astype(jnp.int32)
            tx = vals[11].astype(jnp.int32) + local % bb_w
            ty = vals[12].astype(jnp.int32) + local // bb_w
            return jnp.where(in_range, ty * tile_bw + tx, num_tiles)

        kd = jnp.arange(k0_, dtype=jnp.int32)[None, :]
        dense_in = kd < counts[:, None]
        tile_id_d = tile_of(table[:, :, None], kd, dense_in)
        rank_d = jnp.broadcast_to(depth_bits[:, None], (n, k0_))
        gid_d = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None],
                                 (n, k0_))
        rem_counts = jnp.maximum(counts - k0_, 0)
        rem_cum = T._cumsum_flat(rem_counts)
        rem_starts = (rem_cum - rem_counts).astype(jnp.int32)
        from brush_tpu.ops.expand_pallas import expand_segments
        tbl17 = jnp.concatenate([
            table,
            (rem_starts % 4096).astype(jnp.float32)[None],
            (rem_starts // 4096).astype(jnp.float32)[None],
        ], axis=0)
        filled = expand_segments(tbl17, rem_starts, rem_counts,
                                 rcfg.isect_cap)
        return m + 0.0 * (filled[0, :1] + tile_id_d[0, :1].astype(jnp.float32)
                          + rank_d[0, :1].astype(jnp.float32)
                          + gid_d[0, :1].astype(jnp.float32))
    chain_time(fexp, args[0], label="proj+expand(nosort)")

    # kernel only: freeze a binned scene, re-rasterize with jittered ranges
    proj = jax.jit(lambda m: project_splats(
        m, *args[1:], cam_in, img, sh_degree=0))(args[0])
    isect = jax.jit(lambda p: build_intersections(
        p, img, rcfg.isect_cap, expand_k0=rcfg.expand_k0))(proj)
    soa = isect.soa
    ranges = isect.tile_ranges
    print("num_isects(remainder) =", int(isect.num_isects),
          " total bbox slots =", int(np.asarray(
              jax.jit(lambda p: p.num_tiles_bbox.sum())(proj))), flush=True)

    @jax.jit
    def fkern(s):
        tiles = rasterize_forward_pallas(s, ranges, bg, img)
        o = tiles_to_image(tiles, img)
        return s + 0.0 * o[0, 0, 0]
    chain_time(fkern, soa, label="fwd_kernel(+img asm)")


if __name__ == "__main__":
    main()
