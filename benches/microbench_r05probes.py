"""Round-5 probe batch (run after the quality slot frees).

1. grid-floor: per-grid-step overhead of a trivial matrix-output Pallas
   kernel at emission-like step counts (the hypothesis behind the
   BLKS=16384 emission and TPG=4 rasterizer regrouping).
2. sort shapes: lax.sort at the EXACT pipeline operand shapes — fwd
   (key + 2 u64 + 1 u32), train (key + 5 u64), unpacked train (key +
   10 u32) — to locate the in-pipeline premium over the round-4
   microbench cost law (STAGES_r05 measured ~9-10 ms/operand vs the
   standalone ~3.7).
3. k0 economics: exact-intersection totals per dense width k0 on the
   bench scene (drives plan_caps' slot-count minimization).

Chained-dependency timing; all outputs consumed.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def chain(fn, x, iters=6, label=""):
        y = fn(x)
        _ = float(jax.tree_util.tree_leaves(y)[-1].ravel()[0:1].sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            y = fn(y) if jax.tree_util.tree_structure(
                y) == jax.tree_util.tree_structure(x) else fn(x)
        _ = float(jax.tree_util.tree_leaves(y)[-1].ravel()[0:1].sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:34s} {dt:9.3f} ms", flush=True)
        return dt

    # --- 1. grid floor ---------------------------------------------------
    def make_grid_kernel(nsteps, blks):
        def kern(x_ref, o_ref):
            o_ref[...] = x_ref[...] + 1.0

        @jax.jit
        def run(x):
            return pl.pallas_call(
                kern,
                grid=(nsteps,),
                in_specs=[pl.BlockSpec((16, blks), lambda i: (0, i))],
                out_specs=pl.BlockSpec((16, blks), lambda i: (0, i)),
                out_shape=jax.ShapeDtypeStruct((16, nsteps * blks),
                                               jnp.float32),
            )(x)
        return run

    for nsteps, blks in [(1492, 4096), (373, 16384), (8160, 1024),
                         (2040, 4096)]:
        x = jnp.ones((16, nsteps * blks), jnp.float32)
        dt = chain(make_grid_kernel(nsteps, blks), x, iters=6,
                   label=f"gridfloor {nsteps}x{blks}")
        print(f"    -> {dt / nsteps * 1e3:.2f} us/step", flush=True)

    # --- 2. sort shapes --------------------------------------------------
    S = 6_094_848  # ~the r05 s_pad scale, 4096-divisible
    kg = jax.random.PRNGKey
    key = jax.random.randint(kg(0), (S,), 0, (1 << 31) - 1,
                             dtype=jnp.int32).astype(jnp.uint32)
    with jax.enable_x64():
        p64 = []
        for i in range(5):
            lo = jax.random.randint(kg(2 * i + 1), (S,), 0, (1 << 31) - 1,
                                    dtype=jnp.int32).astype(jnp.uint64)
            hi = jax.random.randint(kg(2 * i + 2), (S,), 0, (1 << 31) - 1,
                                    dtype=jnp.int32).astype(jnp.uint64)
            p64.append(lo | (hi << jnp.uint64(32)))
    p32 = [jax.random.randint(kg(i + 10), (S,), 0, (1 << 31) - 1,
                              dtype=jnp.int32).astype(jnp.uint32)
           for i in range(10)]

    def mksort(*ops):
        @jax.jit
        def f(k):
            out = jax.lax.sort((k, *ops), num_keys=1, is_stable=False)
            # Consume EVERY output: a key-only probe lets XLA DCE the
            # payload moves entirely (this exact bug produced the bogus
            # round-4 "per-operand/per-byte" and the first round-5
            # "payload-flat" sort cost laws).
            acc = out[0] ^ jnp.uint32(1)
            for r in out[1:]:
                if r.dtype == jnp.uint64:
                    acc = acc ^ (r & jnp.uint64(0xFFFFFFFF)
                                 ).astype(jnp.uint32)
                elif r.dtype == jnp.uint32:
                    acc = acc ^ r
                else:
                    acc = acc ^ jax.lax.bitcast_convert_type(r, jnp.uint32)
            return acc
        return f

    chain(mksort(), key, label="sort key only")
    chain(mksort(p64[0]), key, label="sort key + 1 u64")
    chain(mksort(*p64[:2], p32[0]), key, label="sort key + 2 u64 + 1 u32 (fwd)")
    chain(mksort(*p64), key, label="sort key + 5 u64 (train)")
    chain(mksort(*p32), key, label="sort key + 10 u32 (unpacked)")
    chain(mksort(*p32[:5]), key, label="sort key + 5 u32")

    # --- 3. k0 economics -------------------------------------------------
    from brush_tpu.camera import Camera
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.tiling import exact_tile_counts
    from brush_tpu.render import camera_inputs
    from brush_tpu.utils.synthetic import bench_splats

    n = 1_000_000
    img = (1920, 1080)
    cam = Camera(position=np.array([0.0, 0.0, -18.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=1.0, fov_y=0.62)
    sp = bench_splats(n, sh_degree=0)
    cam_in = camera_inputs(cam, img)

    @jax.jit
    def stats(means, log_scales, quats, opac):
        sh0 = jnp.zeros((n, 1, 3), jnp.float32)
        proj = project_splats(means, log_scales, quats, sh0, opac,
                              cam_in, img, sh_degree=0)
        _, cnt = exact_tile_counts(proj)
        return cnt

    cnt = np.asarray(stats(sp.means, sp.log_scales, sp.quats,
                           sp.raw_opacities))
    total = int(cnt.sum())
    print(f"total exact isects: {total}; visible: {int((cnt > 0).sum())}; "
          f"mean {cnt.mean():.2f} p50 {np.percentile(cnt, 50):.0f} "
          f"p90 {np.percentile(cnt, 90):.0f} p99 {np.percentile(cnt, 99):.0f} "
          f"max {cnt.max()}", flush=True)
    for k0 in (1, 2, 3, 4, 6, 8):
        dense = n * k0
        rem = int(np.maximum(cnt - k0, 0).sum())
        print(f"k0={k0}: dense={dense / 1e6:.2f}M rem={rem / 1e6:.2f}M "
              f"S={(dense + rem) / 1e6:.2f}M", flush=True)


if __name__ == "__main__":
    main()
