"""Forward-image parity against gsplat golden renders.

Mirrors the reference's reference-match suite
(brush-bench-test/src/reference.rs:44-53): atol 1e-5, rtol 1% against
CUDA-gsplat images. Gradients are deliberately NOT compared to gsplat
(gsplat detaches viewdirs before SH eval); backward correctness is covered
by the autodiff-oracle and finite-difference suites instead.
"""

import pathlib
import sys

import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import load_file

from brush_tpu.camera import Camera
from brush_tpu.render import RenderConfig, camera_inputs, render

DATA = pathlib.Path(__file__).parent / "data"

def run_case(name, isect_cap, max_per_tile, use_pallas=False):
    d = load_file(DATA / f"{name}.safetensors")
    # Camera derived from the fixture image dims exactly like reference.rs:
    # 90 deg fov over the width, square pixels (same focal both axes),
    # identity rotation, position (0.123, 0.456, -8).
    h, w = d["out_img"].shape[:2]
    focal = (w / 2.0) / np.tan(np.pi / 4.0)
    img = (w, h)
    cam_host = Camera(
        position=np.array([0.123, 0.456, -8.0]),
        rotation=np.array([1.0, 0.0, 0.0, 0.0]),
        fov_x=np.pi / 2.0,
        fov_y=2.0 * np.arctan((h / 2.0) / focal),
    )
    cfg = RenderConfig(img_size=img, sh_degree=3, isect_cap=isect_cap,
                       max_per_tile=max_per_tile, chunk=32,
                       use_pallas=use_pallas)
    cam = camera_inputs(cam_host, img)
    img_out, aux = render(
        jnp.asarray(d["means"]),
        jnp.asarray(d["scales"]),
        jnp.asarray(d["quats"]),
        jnp.asarray(d["coeffs"]),
        jnp.asarray(d["opacities"]),
        cam,
        jnp.zeros(3, jnp.float32),
        cfg,
    )
    assert int(aux.num_isects) <= isect_cap, "intersection capacity overflow"
    assert int(aux.max_isects_per_tile) <= max_per_tile, "per-tile overflow"
    got = np.asarray(img_out)
    want = d["out_img"]
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-2)


def test_tiny_case():
    run_case("tiny_case", isect_cap=1 << 14, max_per_tile=32)


def test_basic_case():
    run_case("basic_case", isect_cap=1 << 14, max_per_tile=32)


def test_tiny_case_pallas():
    """The gsplat golden through the PRODUCTION Pallas path (interpret mode
    on CPU via _use_interpret; the real chip runs the same kernels in
    benches/tpu_smoke.py)."""
    run_case("tiny_case", isect_cap=1 << 14, max_per_tile=32,
             use_pallas=True)


def test_basic_case_pallas():
    run_case("basic_case", isect_cap=1 << 14, max_per_tile=32,
             use_pallas=True)


def test_mix_case_regression():
    """Mixed visibility/scale regime (reference parity runs a third gsplat
    fixture, mix_case — reference.rs:39 — whose bytes are absent from the
    reference snapshot and unreproducible without CUDA). The inputs here
    follow the reference generator's mix recipe exactly (seed 6, n=76873,
    means spread +-1000, scales log(U*15+0.05): test_cases/
    generate_reference.py); the golden image is this repo's own jnp oracle
    output, digest-locked by tests/data/generate_mix_case.py (rendered on
    demand into a gitignored cache; sha256 drift fails loudly) — a
    regression lock on the regime, not a gsplat parity claim."""
    sys.path.insert(0, str(DATA))
    from generate_mix_case import mix_case_path
    d = load_file(mix_case_path())
    h, w = d["out_img"].shape[:2]
    img = (w, h)
    cam_host = Camera(
        position=np.array([0.123, 0.456, -8.0]),
        rotation=np.array([1.0, 0.0, 0.0, 0.0]),
        fov_x=np.pi / 2.0, fov_y=np.pi / 2.0,
    )
    cfg = RenderConfig(img_size=img, sh_degree=3, isect_cap=1 << 18)
    img_out, aux = render(
        jnp.asarray(d["means"]), jnp.asarray(d["scales"]),
        jnp.asarray(d["quats"]), jnp.asarray(d["coeffs"]),
        jnp.asarray(d["opacities"]), camera_inputs(cam_host, img),
        jnp.zeros(3, jnp.float32), cfg)
    assert int(aux.num_isects) <= cfg.isect_cap
    np.testing.assert_allclose(np.asarray(img_out), d["out_img"],
                               atol=1e-6, rtol=1e-4)
