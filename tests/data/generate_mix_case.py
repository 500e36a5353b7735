"""Mix-regime regression fixture: generated on demand, digest-locked.

The reference's parity suite runs tiny/basic/mix gsplat goldens
(brush-bench-test/src/reference.rs:38-53), but the snapshot of the
reference tree ships only tiny+basic fixture files — mix_case.safetensors
is referenced by include_bytes! yet absent, and gsplat needs CUDA, so the
original golden image cannot be reproduced here. This module regenerates
the INPUTS with the same recipe and constants as the reference generator
(test_cases/generate_reference.py CASES[2]: seed 6, n=76873, means spread
+-1000, log-scales log(U*15+0.05), uniform opacities — the "mixed
visibility/scale regimes" the two smaller cases miss) and renders the
golden with this repo's jnp oracle on CPU.

The fixture is a REGRESSION LOCK, not a gsplat parity claim. The 19 MB
blob is not committed; instead `mix_case_digest.json` pins sha256 hashes
of every tensor (inputs AND rendered golden). `mix_case_path()` renders
into a gitignored cache on first use and verifies the hashes — if the
renderer (or torch's RNG stream) drifts, generation FAILS LOUDLY instead
of silently re-freezing a new golden, which is exactly what a frozen blob
would have given us without the repository weight.

CLI: python tests/data/generate_mix_case.py [--refresh-digest]
(--refresh-digest intentionally rewrites the lock after a *reviewed*
renderer change.)
"""

import hashlib
import json
import pathlib
import sys

_HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(_HERE.parents[1]))

import numpy as np

DIGEST_PATH = _HERE / "mix_case_digest.json"
CACHE_PATH = _HERE / "_gen_cache" / "mix_case_jnp.safetensors"


def gen_inputs():
    import torch
    torch.manual_seed(6)
    n, mean_scale = 76873, 2000.0

    def rand(*shape):
        return torch.rand(*shape)

    means = mean_scale * (rand(n, 3) - 0.5)
    log_scales = (rand(n, 3) * 15.0 + 0.05).log()
    quats = rand(n, 4)
    coeffs = (rand(n, 16, 3) - 0.5) * 0.5
    opacities = rand(n)
    return {k: v.numpy() for k, v in dict(
        means=means, scales=log_scales, quats=quats, coeffs=coeffs,
        opacities=opacities).items()}


def _render_case():
    import jax

    if jax.default_backend() != "cpu":
        # The jnp oracle must run on the CPU BACKEND (build_intersections
        # branches on default_backend(), not on the device placement), so
        # a TPU-attached caller regenerates in a clean CPU subprocess.
        import subprocess
        subprocess.run(
            [sys.executable, str(_HERE / "generate_mix_case.py"),
             "--write-cache-only"], check=True)
        from safetensors.numpy import load_file
        return dict(load_file(CACHE_PATH))

    import jax.numpy as jnp

    from brush_tpu.camera import Camera
    from brush_tpu.render import RenderConfig, camera_inputs, render

    d = gen_inputs()
    w = h = 256
    img = (w, h)
    cam = Camera(position=np.array([0.123, 0.456, -8.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=np.pi / 2.0, fov_y=np.pi / 2.0)
    cfg = RenderConfig(img_size=img, sh_degree=3, isect_cap=1 << 18,
                       use_pallas=False)
    out_img, aux = render(
        jnp.asarray(d["means"]), jnp.asarray(d["scales"]),
        jnp.asarray(d["quats"]), jnp.asarray(d["coeffs"]),
        jnp.asarray(d["opacities"]), camera_inputs(cam, img),
        jnp.zeros(3, jnp.float32), cfg)
    assert int(aux.num_isects) <= cfg.isect_cap
    d["out_img"] = np.asarray(out_img)
    return d


def _hashes(d):
    return {k: hashlib.sha256(np.ascontiguousarray(v).tobytes()).hexdigest()
            for k, v in sorted(d.items())}


def mix_case_path(refresh_digest: bool = False) -> pathlib.Path:
    """Path to the (cached) fixture; renders + digest-verifies on first use."""
    from safetensors.numpy import load_file, save_file

    lock = json.loads(DIGEST_PATH.read_text())
    if CACHE_PATH.exists():
        try:
            if _hashes(load_file(CACHE_PATH)) == lock["sha256"]:
                return CACHE_PATH
        except Exception:
            pass  # corrupt cache: fall through and regenerate
    d = _render_case()
    got = _hashes(d)
    if refresh_digest:
        lock["sha256"] = got
        lock["out_img_stats"] = {
            "min": float(d["out_img"].min()),
            "max": float(d["out_img"].max()),
            "mean": float(d["out_img"].mean())}
        DIGEST_PATH.write_text(json.dumps(lock, indent=1))
    elif got != lock["sha256"]:
        diff = [k for k in got if got[k] != lock["sha256"].get(k)]
        raise AssertionError(
            f"mix_case regeneration drifted from the digest lock on {diff}: "
            "the jnp oracle renderer (or the torch RNG stream) no longer "
            "reproduces the frozen golden. If the change is intentional and "
            "reviewed, rerun with --refresh-digest.")
    CACHE_PATH.parent.mkdir(parents=True, exist_ok=True)
    save_file(d, str(CACHE_PATH))
    return CACHE_PATH


if __name__ == "__main__":
    # The env pins JAX_PLATFORMS=axon via a site hook; config.update is the
    # authoritative override (see tests/conftest.py) and must land before
    # jax initializes. The oracle render must run on the CPU backend.
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache_cpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if "--write-cache-only" in sys.argv:
        # subprocess leg of _render_case: render on the CPU backend and
        # write the cache; the parent process digest-verifies it.
        from safetensors.numpy import save_file
        CACHE_PATH.parent.mkdir(parents=True, exist_ok=True)
        save_file(_render_case(), str(CACHE_PATH))
        print(f"cache written to {CACHE_PATH}")
    else:
        p = mix_case_path(refresh_digest="--refresh-digest" in sys.argv)
        print(f"fixture at {p}")
