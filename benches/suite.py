"""Benchmark matrix mirroring the reference's divan benches
(brush-bench-test/src/benches.rs:223-305):

  forward : {0.5M, 1M, 2.5M} splats @1080p; 2M @ {1024x1024, 1080p,
            1440p, 1800p}
  backward: {1M, 2M, 5M} @1080p; 2M @ the 4 resolutions
  train   : full trainer step {0.5M, 1M, 2.5M} @1080p

Splats are generated at sh_degree=0 like the reference's gen_splats
(benches.rs:100 `.with_sh_degree(0)`); forward rows run the fwd-only
kernel specialization (the reference's inference pass, rasterize.rs:
172-177); backward/train rows run the full training kernels. Capacities
come from the scene-counting planner (ops/capacity.py) exactly as
production rendering plans them.

Run on the real TPU:
  python benches/suite.py [forward|backward|train|all] [--json PATH]
Each result prints one JSON line; a summary table prints at the end;
--json writes the whole matrix as one artifact (SUITE_r{N}.json).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

RESOLUTIONS = {
    "1024sq": (1024, 1024),
    "1080p": (1920, 1080),
    "1440p": (2560, 1440),
    "1800p": (3200, 1800),
}


def _setup(n_splats, img, forward_only):
    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.render import RenderConfig, camera_inputs

    cam, splats = _scene(n_splats, img)
    cam_in = camera_inputs(cam, img)
    k0, rem_cap = plan_caps(splats.means, splats.log_scales, splats.quats,
                            splats.raw_opacities, cam_in, img)
    rcfg = RenderConfig(img_size=img, sh_degree=0,
                        isect_cap=rem_cap, expand_k0=k0,
                        use_pallas=True, forward_only=forward_only)
    args = (splats.means, splats.log_scales, splats.quats,
            splats.sh_coeffs, splats.raw_opacities)
    return args, cam_in, rcfg, jnp.zeros(3, jnp.float32)


def _scene(n_splats, img):
    from brush_tpu.camera import Camera
    from brush_tpu.utils.synthetic import bench_splats
    cam = Camera(position=np.array([0.0, 0.0, -18.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=1.0, fov_y=1.0 * img[1] / img[0])
    return cam, bench_splats(n_splats, sh_degree=0)


def _time(fn, args, iters=10):
    out = fn(*args)
    _block(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _block(out)
    return (time.perf_counter() - t0) / iters


def _block(out):
    import jax
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
            return


def _emit(name, seconds, unit="ms"):
    rec = {"metric": name, "value": round(seconds * 1e3, 3), "unit": unit,
           "fps": round(1.0 / seconds, 2)}
    print(json.dumps(rec), flush=True)
    return rec


def _emit_error(name, exc):
    """A row that fails (OOM, overflow) is recorded, not dropped — the
    artifact must show the whole matrix (VERDICT r4 next-round #2)."""
    msg = f"{type(exc).__name__}: {exc}"
    rec = {"metric": name, "error": msg[:500]}
    print(json.dumps(rec), flush=True)
    return rec


def bench_forward():
    import jax

    from brush_tpu.render import render

    results = []
    cases = ([(n, RESOLUTIONS["1080p"]) for n in
              (500_000, 1_000_000, 2_500_000)] +
             [(2_000_000, r) for r in RESOLUTIONS.values()])
    for n, img in cases:
        name = f"forward_{n // 1000}k_{img[0]}x{img[1]}"
        try:
            args, cam, rcfg, bg = _setup(n, img, forward_only=True)

            @jax.jit
            def fwd(*a):
                out, _ = render(*a, cam, bg, rcfg)
                return out

            dt = _time(fwd, args)
            results.append(_emit(name, dt))
        except Exception as e:  # noqa: BLE001 — record OOM/overflow rows
            results.append(_emit_error(name, e))
    return results


def bench_backward():
    import jax

    from brush_tpu.render import render

    results = []
    cases = ([(n, RESOLUTIONS["1080p"]) for n in
              (1_000_000, 2_000_000, 5_000_000)] +
             [(2_000_000, r) for r in RESOLUTIONS.values()])
    for n, img in cases:
        name = f"backward_{n // 1000}k_{img[0]}x{img[1]}"
        try:
            args, cam, rcfg, bg = _setup(n, img, forward_only=False)

            @jax.jit
            def bwd(*a):
                def loss(*p):
                    out, _ = render(*p, cam, bg, rcfg)
                    return out[..., :3].mean()
                return jax.grad(loss, argnums=(0, 1, 2, 3, 4))(*a)

            dt = _time(bwd, args)
            results.append(_emit(name, dt))
        except Exception as e:  # noqa: BLE001 — record OOM/overflow rows
            results.append(_emit_error(name, e))
    return results


def bench_train():
    import jax
    import jax.numpy as jnp

    from brush_tpu.ops.capacity import plan_caps
    from brush_tpu.ops.loss import pack_gt
    from brush_tpu.render import RenderConfig, camera_inputs
    from brush_tpu.train.config import TrainConfig
    from brush_tpu.train.trainer import (
        SceneBatch, init_train_state, train_step)

    results = []
    img = RESOLUTIONS["1080p"]
    for n in (500_000, 1_000_000, 2_500_000):
        name = f"train_step_{n // 1000}k_1080p"
        try:
            cam, splats = _scene(n, img)
            cam_in = camera_inputs(cam, img)
            k0, rem_cap = plan_caps(splats.means, splats.log_scales,
                                    splats.quats, splats.raw_opacities,
                                    cam_in, img)
            rng = np.random.default_rng(0)
            gt = pack_gt(rng.uniform(0, 1, (img[1], img[0], 3))
                         .astype(np.float32))
            batch = SceneBatch(gt_packed=jnp.asarray(gt), cam=cam_in)
            rcfg = RenderConfig(img_size=img, sh_degree=0,
                                isect_cap=rem_cap,
                                expand_k0=k0, use_pallas=True)
            tcfg = TrainConfig()
            state = init_train_state(splats, jax.random.PRNGKey(0), 3.0)
            step = jax.jit(lambda s, b: train_step(s, b, tcfg, rcfg),
                           donate_argnums=0)

            state, stats, _ = step(state, batch)   # compile + warmup
            stats.loss.block_until_ready()
            iters = 10
            t0 = time.perf_counter()
            for _ in range(iters):
                state, stats, _ = step(state, batch)
            stats.loss.block_until_ready()
            dt = (time.perf_counter() - t0) / iters
            results.append(_emit(name, dt))
        except Exception as e:  # noqa: BLE001 — record OOM/overflow rows
            results.append(_emit_error(name, e))
    return results


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    which = args[0] if args else "all"
    out = []
    if which in ("forward", "all"):
        out += bench_forward()
    if which in ("backward", "all"):
        out += bench_backward()
    if which in ("train", "all"):
        out += bench_train()
    print("\n== summary ==")
    for r in out:
        if "error" in r:
            print(f"{r['metric']:>34}: ERROR {r['error'][:60]}")
        else:
            print(f"{r['metric']:>34}: {r['value']:>9.2f} ms "
                  f"({r['fps']:.1f}/s)")
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump({
                "device": jax.devices()[0].device_kind,
                "note": ("reference bench matrix, benches.rs:223-305; "
                         "sh_degree=0 splats (benches.rs:100); forward "
                         "rows = fwd-only kernel, backward/train rows = "
                         "training kernels; capacities from plan_caps"),
                "results": out,
            }, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
