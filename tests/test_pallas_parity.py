"""Pallas production kernels vs the jnp oracle: forward images and the full
hand-derived backward (parameter grads, refine weight, visibility mask).
Runs in Pallas interpret mode on CPU; the same comparison passes on real TPU
(see .claude/skills/verify/SKILL.md)."""

import dataclasses
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file

from brush_tpu.camera import Camera
from brush_tpu.render import RenderConfig, camera_inputs, render_with_refine

DATA = pathlib.Path(__file__).parent / "data"


def setup(name="basic_case"):
    d = load_file(DATA / f"{name}.safetensors")
    h, w = d["out_img"].shape[:2]
    focal = (w / 2.0) / np.tan(np.pi / 4.0)
    cam = Camera(position=np.array([0.123, 0.456, -8.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=np.pi / 2, fov_y=2 * np.arctan((h / 2.0) / focal))
    ci = camera_inputs(cam, (w, h))
    params = (jnp.asarray(d["means"]), jnp.asarray(d["scales"]),
              jnp.asarray(d["quats"]), jnp.asarray(d["coeffs"]),
              jnp.asarray(d["opacities"]))
    cfg = RenderConfig(img_size=(w, h), sh_degree=3, isect_cap=1 << 14,
                       max_per_tile=64)
    return params, ci, cfg, d


def test_pallas_forward_matches_jnp():
    params, ci, cfg, d = setup()
    bg = jnp.array([0.3, 0.2, 0.1], jnp.float32)
    n = params[0].shape[0]
    rh, vh = jnp.zeros(n), jnp.zeros(n)
    img_j, _ = render_with_refine(*params, ci, bg, cfg, rh, vh)
    img_p, _ = render_with_refine(
        *params, ci, bg, dataclasses.replace(cfg, use_pallas=True), rh, vh)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                               atol=2e-6, rtol=1e-5)


def test_pallas_backward_matches_jnp():
    params, ci, cfg, d = setup()
    bg = jnp.array([0.1, 0.25, 0.4], jnp.float32)
    n = params[0].shape[0]

    def make_loss(cfg):
        def loss(params, rh, vh):
            img, _ = render_with_refine(*params, ci, bg, cfg, rh, vh)
            wmap = jnp.linspace(0.5, 1.5, img.shape[0])[:, None, None]
            return jnp.sum(img * wmap * jnp.array([1.0, 0.8, 0.6, 0.4]))
        return loss

    rh, vh = jnp.zeros(n), jnp.zeros(n)
    lj, gj = jax.value_and_grad(make_loss(cfg), argnums=(0, 1, 2))(params, rh, vh)
    lp, gp = jax.value_and_grad(
        make_loss(dataclasses.replace(cfg, use_pallas=True)),
        argnums=(0, 1, 2))(params, rh, vh)

    assert abs(float(lj) - float(lp)) / abs(float(lj)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(gp[0]),
                    jax.tree_util.tree_leaves(gj[0])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / scale < 1e-5, "param grad mismatch"
    # Refine weight.
    a, b = np.asarray(gp[1]), np.asarray(gj[1])
    assert np.abs(a - b).max() / (np.abs(b).max() + 1e-12) < 1e-5
    # Visibility mask: exact.
    np.testing.assert_array_equal(np.asarray(gp[2]), np.asarray(gj[2]))
