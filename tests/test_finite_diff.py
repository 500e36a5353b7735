"""Finite-difference gradient checks on a hand-tuned small scene.

Mirrors brush-bench-test/tests/finite_diff.rs: central differences per
parameter category, rendered with the C^1 smooth alpha cutoff
(RasterPass::BackwardSmoothCutoff — smooth_cutoff=True) so analytic and
numeric gradients agree at the 1/255 discontinuity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.ops.sh import rgb_to_sh_dc
from brush_tpu.render import RenderConfig, camera_inputs, render

IMG = (48, 48)
CFG = RenderConfig(img_size=IMG, sh_degree=1, isect_cap=1 << 12,
                   max_per_tile=64, chunk=32, smooth_cutoff=True)


def scene():
    means = jnp.array([
        [0.0, 0.0, 0.0],
        [0.4, 0.2, 0.5],
        [-0.3, -0.1, 1.0],
        [0.1, -0.4, 1.5],
    ], jnp.float32)
    log_scales = jnp.log(jnp.array([
        [0.4, 0.3, 0.35],
        [0.25, 0.4, 0.3],
        [0.35, 0.25, 0.3],
        [0.3, 0.3, 0.25],
    ], jnp.float32))
    quats = jnp.array([
        [0.9, 0.1, 0.2, 0.0],
        [1.0, 0.0, 0.0, 0.0],
        [0.8, -0.2, 0.1, 0.3],
        [0.95, 0.05, -0.1, 0.1],
    ], jnp.float32)
    rng = np.random.default_rng(11)
    sh = jnp.asarray(rng.normal(0, 0.3, (4, 4, 3)), jnp.float32)
    raw_opac = jnp.array([0.5, 0.0, -0.4, 0.8], jnp.float32)
    return (means, log_scales, quats, sh, raw_opac)


CAM = Camera(position=np.array([0.0, 0.0, -4.0]),
             rotation=np.array([1.0, 0.0, 0.0, 0.0]),
             fov_x=0.7, fov_y=0.7)


def loss_fn(params):
    cam = camera_inputs(CAM, IMG)
    img, _ = render(*params, cam, jnp.array([0.1, 0.2, 0.3]), CFG)
    w = jnp.cos(jnp.arange(IMG[1]))[:, None, None] + 1.5
    return jnp.sum(img * w)


@pytest.mark.parametrize("pidx,name,eps,tol", [
    (0, "means", 2e-3, 2e-2),
    (1, "log_scales", 2e-3, 2e-2),
    (2, "quats", 2e-3, 2e-2),
    (3, "sh_coeffs", 2e-3, 2e-2),
    (4, "raw_opacities", 2e-3, 2e-2),
])
def test_finite_diff(pidx, name, eps, tol):
    params = scene()
    grads = jax.grad(loss_fn)(params)
    g = np.asarray(grads[pidx])

    p = [np.asarray(x).copy() for x in params]
    flat = p[pidx].reshape(-1)
    num = np.zeros_like(flat)
    for i in range(flat.size):
        orig = flat[i]
        flat[i] = orig + eps
        lp = float(loss_fn(tuple(jnp.asarray(x) for x in p)))
        flat[i] = orig - eps
        lm = float(loss_fn(tuple(jnp.asarray(x) for x in p)))
        flat[i] = orig
        num[i] = (lp - lm) / (2 * eps)

    num = num.reshape(g.shape)
    scale = max(np.abs(num).max(), np.abs(g).max(), 1e-3)
    err = np.abs(g - num).max() / scale
    assert err < tol, f"{name}: rel err {err:.4f}\nanalytic:\n{g}\nnumeric:\n{num}"
