"""Per-stage chained timing of the forward pipeline on the real TPU.

The axon tunnel makes naive timing lie (~6-8 ms fixed dispatch per jit
call; block_until_ready can return early), so every measurement chains
iterations through a data dependency and fetches a dependent scalar at the
end. Subtract the printed `dispatch_floor` from everything.

Writes STAGES_r<N>.json at the repo root when run with --json <path>
(the committed stage-table artifact; VERDICT r3 item 1).

Stages measured (each INCLUDES the previous ones; the per-stage cost is
the difference of consecutive rows):
  projection      project_splats
  counts          + exact tile counts / hit masks / cumsum bookkeeping
  emit            + fused emission kernel (ops/emit_pallas.py)
  sort            + 1-u32-key 5-u64-payload tile sort (ops/tiling_key.py)
  binning         + SoA stack + tile bounds (== full build_intersections)
  forward         + rasterize kernel + image assembly (== whole frame)
  kernel_only     rasterizer alone on a frozen binned scene
"""

import json
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
    from brush_tpu.constants import TILE_WIDTH
    from brush_tpu.ops import tiling as T
    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.ops.emit_pallas import emit_slots
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_pallas import (
        rasterize_forward_pallas, tiles_to_image)
    from brush_tpu.ops.tiling import build_intersections
    from brush_tpu.ops.tiling_key import sort_packed
    from brush_tpu.render import RenderConfig, camera_inputs, render
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
    results = {}

    def chain_time(fn, x0, iters=6, label=""):
        x = fn(x0)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:28s} {dt:9.3f} ms", flush=True)
        results[label] = round(dt, 3)
        return dt

    @jax.jit
    def f0(m):
        return m + 1.0
    chain_time(f0, args[0], label="dispatch_floor")

    img_w, img_h = img
    tile_bw = -(-img_w // TILE_WIDTH)
    num_tiles = tile_bw * (-(-img_h // TILE_WIDTH))

    def stage_proj(m):
        return project_splats(m, *args[1:], cam_in, img, sh_degree=0)

    def stage_counts(m):
        """Everything build_intersections does before the emission kernel."""
        proj = jax.tree.map(jax.lax.stop_gradient, stage_proj(m))
        n = proj.depth.shape[0]
        hit_mask, counts = T.exact_tile_counts(proj)
        depth_bits = jax.lax.bitcast_convert_type(
            jnp.maximum(proj.depth, 0.0), jnp.int32)
        table = [
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
        ]
        rem_counts = jnp.maximum(counts - k0, 0)
        rem_cum = T._cumsum_flat(rem_counts)
        rem_starts = (rem_cum - rem_counts).astype(jnp.int32)
        return table, rem_starts

    def stage_emit(m):
        table, rem_starts = stage_counts(m)
        emat = emit_slots(table, rem_starts, k0, rem_cap, img)
        key = (emat[0].astype(jnp.uint32)
               | (emat[11].astype(jnp.uint32) << jnp.uint32(16)))
        return key, [emat[r] for r in range(1, 10)], emat[10]

    def stage_sort(m):
        key, pays, gid = stage_emit(m)
        return sort_packed(key, list(pays) + [gid])

    @jax.jit
    def fproj(m):
        return m + 0.0 * stage_proj(m).depth[:1, None]
    chain_time(fproj, args[0], label="projection")

    @jax.jit
    def fcounts(m):
        table, rem_starts = stage_counts(m)
        return m + 0.0 * (table[0][:1] + rem_starts[:1].astype(jnp.float32))
    chain_time(fcounts, args[0], label="counts")

    @jax.jit
    def femit(m):
        key, pays, gid = stage_emit(m)
        return m + 0.0 * (pays[0][:1] + gid[:1]
                          + key[:1].astype(jnp.float32))
    chain_time(femit, args[0], label="emit")

    @jax.jit
    def fsort(m):
        key_s, rows_s = stage_sort(m)
        acc = key_s[:1].astype(jnp.float32)
        for r in rows_s:
            acc = acc + r[:1]
        return m + 0.0 * acc
    chain_time(fsort, args[0], label="sort")

    # Forward-only sort: u16-precision payload diet (pack_fwd_rows),
    # 2 u64 + 1 u32 operands — what bench.py's headline path sorts.
    from brush_tpu.ops.tiling_key import pack_fwd_rows

    @jax.jit
    def fsort_fwd(m):
        key, pays, _gid = stage_emit(m)
        rows5 = pack_fwd_rows(key, list(pays), num_tiles, tile_bw)
        key_s, rows_s = sort_packed(key, rows5)
        acc = key_s[:1].astype(jnp.float32)
        for r in rows_s:
            acc = acc + r[:1]
        return m + 0.0 * acc
    chain_time(fsort_fwd, args[0], label="sort_fwdonly")

    @jax.jit
    def fbin(m):
        proj = stage_proj(m)
        isect = build_intersections(proj, img, rcfg.isect_cap,
                                    expand_k0=rcfg.expand_k0)
        return m + 0.0 * (isect.soa[0, :1]
                          + isect.tile_ranges[0, :1].astype(jnp.float32))
    chain_time(fbin, args[0], label="binning")

    @jax.jit
    def ffull(m):
        out, _ = render(m, *args[1:], cam_in, bg, rcfg)
        return m + 0.0 * out[0, 0, 0]
    chain_time(ffull, args[0], label="forward")

    import dataclasses as _dc
    rcfg_fwd = _dc.replace(rcfg, forward_only=True)

    @jax.jit
    def ffull_fwd(m):
        out, _ = render(m, *args[1:], cam_in, bg, rcfg_fwd)
        return m + 0.0 * out[0, 0, 0]
    chain_time(ffull_fwd, args[0], label="forward_fwdonly")

    # kernel only: freeze a binned scene, re-rasterize
    proj = jax.jit(lambda m: project_splats(
        m, *args[1:], cam_in, img, sh_degree=0))(args[0])
    isect = jax.jit(lambda p: build_intersections(
        p, img, rcfg.isect_cap, expand_k0=rcfg.expand_k0))(proj)
    soa = isect.soa
    ranges = isect.tile_ranges
    n_isects = int(isect.num_isects)
    print("num_isects(remainder) =", n_isects, flush=True)

    @jax.jit
    def fkern(s):
        tiles = rasterize_forward_pallas(s, ranges, bg, img)
        o = tiles_to_image(tiles, img)
        return s + 0.0 * o[0, 0, 0]
    chain_time(fkern, soa, label="kernel_only")

    # fwd-only kernel on a fwd-only-binned scene (u16 payload diet): the
    # rasterizer row of the SHIPPED headline path (VERDICT r4 weak #2).
    isect_f = jax.jit(lambda p: build_intersections(
        p, img, rcfg.isect_cap, expand_k0=rcfg.expand_k0,
        with_bwd_info=False))(proj)
    soa_f = isect_f.soa
    ranges_f = isect_f.tile_ranges

    @jax.jit
    def fkern_fwd(s):
        tiles = rasterize_forward_pallas(s, ranges_f, bg, img,
                                         fwd_only=True)
        o = tiles_to_image(tiles, img)
        return s + 0.0 * o[0, 0, 0]
    chain_time(fkern_fwd, soa_f, label="kernel_only_fwdonly")

    # --- backward split (the train-steps/s blocker, SUITE_r05:
    # backward 1M@1080p = 251 ms) ------------------------------------
    from brush_tpu.ops.rasterize_pallas import (
        _reduce_grads_sorted, image_to_tiles, rasterize_backward_pallas)
    n = n_splats
    chunk_cap = rcfg.resolved_chunk_cap(n)
    tiles_fwd = jax.jit(lambda s: rasterize_forward_pallas(
        s, ranges, bg, img))(soa)
    v_img = jnp.ones((img[1], img[0], 4), jnp.float32) * 0.1
    v_tiles = jax.jit(lambda v: image_to_tiles(v, img))(v_img)

    @jax.jit
    def fbwdk(s):
        g = rasterize_backward_pallas(s, ranges, isect.chunk_starts,
                                      tiles_fwd, v_tiles, bg, img,
                                      chunk_cap)
        return s + 0.0 * g[0, :1]
    chain_time(fbwdk, soa, label="bwd_kernel_only")

    grads3 = jax.jit(lambda s: rasterize_backward_pallas(
        s, ranges, isect.chunk_starts, tiles_fwd, v_tiles, bg, img,
        chunk_cap))(soa)

    @jax.jit
    def fbwdr(g):
        per = _reduce_grads_sorted(g, isect.num_chunks,
                                   isect.surv_starts_g,
                                   isect.surv_counts_g, n)
        return g + 0.0 * per[0, :1]
    chain_time(fbwdr, grads3, label="bwd_reduce_only")

    @jax.jit
    def fbwd_total(m):
        def loss(mm):
            out, _ = render(mm, *args[1:], cam_in, bg, rcfg)
            return jnp.sum(out[..., :3] * 0.1)
        g = jax.grad(loss)(m)
        return m + 0.0 * g[:1]
    chain_time(fbwd_total, args[0], label="backward_total")

    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump({
                "config": {"n_splats": n_splats, "img": img, "k0": k0,
                           "rem_cap": rem_cap,
                           "s_cap": n_splats * k0 + rem_cap,
                           "num_isects_remainder": n_isects},
                "cumulative_ms": results,
                "note": ("stages are cumulative; per-stage cost is the "
                         "difference of consecutive rows minus nothing "
                         "(dispatch floor cancels in differences)"),
            }, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
