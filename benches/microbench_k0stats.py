"""Round-4 probe: exact-intersection statistics of the bench scene, per
dense-width k0 — what slot count would each emission split produce?

Feeds the plan_caps cost-model retune: with the per-byte sort cost law
(microbench_sortdecide.py), total sorted slots dominate, so smaller k0
(less dense-region sentinel waste) may now win despite the pricier
remainder expansion.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

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
        hist = jnp.bincount(jnp.clip(cnt, 0, 64), length=65)
        return cnt, hist

    cnt, hist = stats(sp.means, sp.log_scales, sp.quats, sp.raw_opacities)
    cnt = np.asarray(cnt)
    hist = np.asarray(hist)
    total = int(cnt.sum())
    print(f"total exact isects: {total}")
    print(f"visible (cnt>0):    {int((cnt > 0).sum())}")
    print(f"cnt mean/p50/p90/p99/max: {cnt.mean():.2f} "
          f"{np.percentile(cnt, 50):.0f} {np.percentile(cnt, 90):.0f} "
          f"{np.percentile(cnt, 99):.0f} {cnt.max()}")
    print("hist[0..16]:", hist[:17].tolist())
    for k0 in (0, 1, 2, 3, 4, 6, 8):
        dense = n * k0
        rem = int(np.maximum(cnt - k0, 0).sum())
        print(f"k0={k0}: dense={dense/1e6:.2f}M rem={rem/1e6:.2f}M "
              f"S={(dense + rem)/1e6:.2f}M")


if __name__ == "__main__":
    main()
