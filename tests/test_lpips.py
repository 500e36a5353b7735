"""LPIPS architecture invariants (weights not shipped — no egress; the
reference's exact-value test needs the converted VGG weights file).
Mirrors lpips/src/lib.rs:159-215's identity/symmetry checks."""

import jax.numpy as jnp
import numpy as np

from brush_tpu.models.lpips import random_lpips


def imgs():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    b = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)), jnp.float32)
    return a, b


def test_identity_is_zero():
    m = random_lpips()
    a, _ = imgs()
    assert abs(float(m(a, a))) < 1e-6


def test_symmetry_and_positive():
    m = random_lpips()
    a, b = imgs()
    d_ab = float(m(a, b))
    d_ba = float(m(b, a))
    assert d_ab > 0
    assert abs(d_ab - d_ba) < 1e-6


def test_feature_tap_shapes():
    m = random_lpips()
    a, _ = imgs()
    taps = m.features(a)
    assert [t.shape[-1] for t in taps] == [64, 128, 256, 512, 512]
    assert [t.shape[1] for t in taps] == [64, 32, 16, 8, 4]
