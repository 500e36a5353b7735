"""Unit tests for the Pallas scan kernels (interpret mode on CPU).

The carry-scan family is the TPU replacement for the reference's
brush-prefix-sum crate (lib.rs:85-189 tests prefix sums up to 30M
elements); interpret mode exercises the same kernel code path the TPU
runs."""

import numpy as np
import jax.numpy as jnp

from brush_tpu.ops.scan_pallas import (
    BLK, cumsum_rows, fill_rows, scan_rows_pallas, stack_rows)


def test_cumsum_rows_interpret(rng):
    x = jnp.asarray(rng.standard_normal((3, 2 * BLK)), jnp.float32)
    got = np.asarray(scan_rows_pallas(x, op="sum", interpret=True))
    want = np.cumsum(np.asarray(x), axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)


def test_cumsum_rows_unaligned_length(rng):
    x = jnp.asarray(rng.integers(0, 5, (2, 1000)), jnp.int32)
    got = np.asarray(cumsum_rows(x, interpret=True))
    np.testing.assert_array_equal(got, np.cumsum(np.asarray(x), axis=1))


def test_fill_rows_interpret(rng):
    l = BLK + 700
    n_seg = 37
    starts = np.sort(rng.choice(l, n_seg, replace=False)).astype(np.int32)
    vals = rng.standard_normal((5, n_seg)).astype(np.float32)

    x = np.zeros((5, l), np.float32)
    valid = np.zeros((l,), np.int32)
    x[:, starts] = vals
    valid[starts] = 1

    got = np.asarray(fill_rows(jnp.asarray(x), jnp.asarray(valid),
                               interpret=True))

    want = np.zeros_like(x)
    seg = -1
    for j in range(l):
        if valid[j]:
            seg += 1
        want[:, j] = vals[:, seg] if seg >= 0 else 0.0
    np.testing.assert_array_equal(got, want)


def test_fill_rows_preserves_bit_patterns(rng):
    """Rows carrying raw int bit patterns (bitcast keys) must transport
    exactly — including patterns that alias float NaN/Inf."""
    import jax
    l = BLK
    starts = np.array([0, 5, 129, 4000], np.int32)
    bits = np.array([0x7FC00001, 0x7F800000, -1, 123456789], np.int32)
    x = np.zeros((1, l), np.int32)
    valid = np.zeros((l,), np.int32)
    x[0, starts] = bits
    valid[starts] = 1
    xf = jax.lax.bitcast_convert_type(jnp.asarray(x), jnp.float32)
    got = jax.lax.bitcast_convert_type(
        fill_rows(xf, jnp.asarray(valid), interpret=True), jnp.int32)
    got = np.asarray(got)[0]
    want = np.zeros((l,), np.int32)
    seg = -1
    for j in range(l):
        if valid[j]:
            seg += 1
        want[j] = bits[seg] if seg >= 0 else 0
    np.testing.assert_array_equal(got, want)


def test_stack_rows_cpu_path(rng):
    rows = [jnp.asarray(rng.standard_normal(300), jnp.float32)
            for _ in range(3)]
    out = np.asarray(stack_rows(rows, 4, 300))
    assert out.shape[0] == 4
    np.testing.assert_allclose(out[:3, :300], np.stack(rows), rtol=1e-6)
    assert (out[3, :300] == 0).all()
