"""Fuzz: NaN/Inf/denormal/extreme/zero-quat injection straight into raw
tensors, asserting no silent corruption (finite image, finite grads).
Mirrors brush-bench-test/tests/fuzz.rs's SplitMix64-seeded poisoning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.render import RenderConfig, camera_inputs, render

IMG = (48, 48)
CFG = RenderConfig(img_size=IMG, sh_degree=1, isect_cap=1 << 12,
                   max_per_tile=128, chunk=32)
CAM = Camera(position=np.array([0.0, 0.0, -4.0]),
             rotation=np.array([1.0, 0.0, 0.0, 0.0]),
             fov_x=0.8, fov_y=0.8)

POISONS = [np.nan, np.inf, -np.inf, 1e38, -1e38, 1e-40, 0.0, -12345.0]


def base_params(rng, n=24):
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    log_scales = np.full((n, 3), np.log(0.2), np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    sh = rng.normal(0, 0.3, (n, 4, 3)).astype(np.float32)
    raw_opac = rng.normal(0.5, 1, n).astype(np.float32)
    return [means, log_scales, quats, sh, raw_opac]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_no_silent_corruption(seed):
    rng = np.random.default_rng(seed)
    params = base_params(rng)

    # Poison ~15% of entries across all tensors with pathological values.
    for arr in params:
        flat = arr.reshape(-1)
        k = max(1, int(0.15 * flat.size))
        idx = rng.choice(flat.size, k, replace=False)
        flat[idx] = rng.choice(POISONS, k)
    # A few exactly-zero quats (zero-quat poison, tests/mod.rs).
    params[2][:2] = 0.0

    jparams = tuple(jnp.asarray(p) for p in params)
    cam = camera_inputs(CAM, IMG)

    def loss(ps):
        img, _ = render(*ps, cam, jnp.zeros(3), CFG)
        return jnp.mean(img[..., :3] ** 2), img

    (val, img), grads = jax.value_and_grad(loss, has_aux=True)(jparams)
    assert np.isfinite(np.asarray(img)).all(), "image corrupted"
    assert np.isfinite(float(val))
    for g, name in zip(grads, ["means", "ls", "quats", "sh", "opac"]):
        assert np.isfinite(np.asarray(g)).all(), f"grad {name} corrupted"
