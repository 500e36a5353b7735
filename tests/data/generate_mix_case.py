"""Generate the mix-regime regression fixture (mix_case_jnp.safetensors).

The reference's parity suite runs tiny/basic/mix gsplat goldens
(brush-bench-test/src/reference.rs:38-53), but the snapshot of the
reference tree ships only tiny+basic fixture files — mix_case.safetensors
is referenced by include_bytes! yet absent, and gsplat needs CUDA, so the
original golden image cannot be reproduced here. This script regenerates
the INPUTS with the same recipe and constants as the reference generator
(test_cases/generate_reference.py CASES[2]: seed 6, n=76873, means spread
+-1000, log-scales log(U*15+0.05), uniform opacities — the "mixed
visibility/scale regimes" the two smaller cases miss) and freezes the
OUTPUT of this repo's jnp oracle renderer as a regression golden. The
Pallas production path is cross-checked against the same fixture on real
TPU by benches/tpu_smoke.py.

Run from the repo root: python tests/data/generate_mix_case.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[2]))

import numpy as np


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


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from safetensors.numpy import save_file

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
    print("num_isects", int(aux.num_isects),
          "img range", float(d["out_img"].min()), float(d["out_img"].max()))
    save_file(d, str(pathlib.Path(__file__).parent / "mix_case_jnp.safetensors"))


if __name__ == "__main__":
    main()
