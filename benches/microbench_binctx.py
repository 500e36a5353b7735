"""In-context binning cost split: full build_intersections vs a variant
with lax.sort monkeypatched to identity (timing-only, wrong results).
Resolves the isolated-sort (~53 ms) vs in-context (~5 ms) contradiction."""

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
    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops import tiling
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
    args = (splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacities)

    chain_time(jax.jit(lambda x: x + 1.0), args[0], iters=8,
               label="dispatch_floor")

    def fbin(m):
        proj = project_splats(m, *args[1:], cam_in, img, sh_degree=0)
        isect = tiling.build_intersections(proj, img, rem_cap, expand_k0=k0)
        return m + 0.0 * (isect.soa[0, :1] + isect.tile_ranges[0, 0]
                          + isect.surv_starts_g[0].astype(jnp.float32))
    chain_time(jax.jit(fbin), args[0], label="proj+binning(full)")

    real_sort = jax.lax.sort

    def fake_sort(operands, num_keys=1, is_stable=False, dimension=-1):
        if isinstance(operands, (tuple, list)) and len(operands) > 4:
            return tuple(operands)  # skip ONLY the big tile sort
        return real_sort(operands, dimension=dimension, is_stable=is_stable,
                         num_keys=num_keys)

    jax.lax.sort = fake_sort
    try:
        chain_time(jax.jit(fbin), args[0], label="proj+binning(nosort)")
    finally:
        jax.lax.sort = real_sort


if __name__ == "__main__":
    main()
