"""Benchmark driver: forward-render FPS at the reference's headline config.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md north-star): >= 60 FPS @ 1080p rendering at 1-5M
splats on one TPU chip — vs_baseline is FPS / 60.

Mirrors the reference's forward bench shape (brush-bench-test/src/benches.rs:
223-254: N splats at 1920x1080, wall-time over synced iters).
"""

import json
import time

import numpy as np


def main():
    import sys

    import jax
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.render import RenderConfig, camera_inputs, render
    from brush_tpu.utils.synthetic import bench_splats

    smoke = "--smoke" in sys.argv  # tiny CPU-able sanity run of this script
    if smoke:
        jax.config.update('jax_platforms', 'cpu')
    n_splats = 20_000 if smoke else 1_000_000
    img = (256, 144) if smoke else (1920, 1080)

    cam = Camera(position=np.array([0.0, 0.0, -18.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=1.0, fov_y=0.62)
    # sh_degree=0 matches the reference bench exactly: gen_splats ends in
    # .with_sh_degree(0) (brush-bench-test/src/benches.rs:100).
    splats = bench_splats(n_splats, sh_degree=0)

    # Capacity auto-planning (ops/capacity.py) sizes the slot space from the
    # scene's true intersection counts; the assert below verifies the timed
    # render processes the FULL workload with zero truncation.
    from brush_tpu.ops.capacity import plan_caps
    cam_in = camera_inputs(cam, img)
    k0, rem_cap = plan_caps(splats.means, splats.log_scales, splats.quats,
                            splats.raw_opacities, cam_in, img)
    # forward_only mirrors the reference's viewer/inference render path
    # (rasterize.rs:172-177 fwd-only kernel; SURVEY §3.3) — the 60 FPS
    # north-star target is viewer rendering.
    rcfg = RenderConfig(img_size=img, sh_degree=0,
                        isect_cap=rem_cap, expand_k0=k0,
                        use_pallas=True, forward_only=True)
    bg = jnp.zeros(3, jnp.float32)

    @jax.jit
    def fwd(means, log_scales, quats, sh, opac):
        img_out, _ = render(means, log_scales, quats, sh, opac, cam_in, bg, rcfg)
        return img_out

    args = (splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacities)

    _, aux = jax.jit(lambda *a: render(*a, cam_in, bg, rcfg))(*args)
    assert int(aux.num_isects) <= rcfg.isect_cap, \
        f"bench capacity overflow: rem {int(aux.num_isects)} > {rcfg.isect_cap}"

    out = fwd(*args)
    out.block_until_ready()  # compile + warmup

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(*args)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / iters

    fps = 1.0 / dt
    print(json.dumps({
        "metric": f"forward_render_fps_{n_splats // 1000}k_{img[1]}p",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / 60.0, 4),
    }))


if __name__ == "__main__":
    main()
