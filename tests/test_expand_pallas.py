"""Unit tests for the windowed one-hot segmented broadcast
(ops/expand_pallas.py), interpret mode — the TPU remainder-expansion
engine (reference counterpart: map_gaussians.rs slot expansion)."""

import numpy as np
import jax.numpy as jnp

from brush_tpu.ops.expand_pallas import BLKS, expand_segments


def _reference(table, starts, counts, cap):
    rows, n = table.shape
    out = np.zeros((rows, cap), np.float32)
    for g in range(n):
        s, c = int(starts[g]), int(counts[g])
        if c <= 0 or s >= cap:
            continue
        out[:, s:min(s + c, cap)] = table[:, g:g + 1]
    return out


def _run(counts, cap, rows=5, seed=0):
    rng = np.random.default_rng(seed)
    counts = np.asarray(counts, np.int32)
    starts = (np.cumsum(counts) - counts).astype(np.int32)
    table = rng.standard_normal((rows, len(counts))).astype(np.float32)
    got = np.asarray(expand_segments(
        jnp.asarray(table), jnp.asarray(starts), jnp.asarray(counts),
        cap, interpret=True))
    want = _reference(table, starts, counts, cap)
    np.testing.assert_array_equal(got, want)


def test_basic_runs(rng):
    _run([3, 0, 5, 1, 0, 2], cap=16)


def test_exact_fill_and_truncation(rng):
    # Runs crossing cap truncate; starts past cap never emit.
    _run([10, 10, 10], cap=15)


def test_large_single_owner(rng):
    # One owner spanning several slot blocks exercises the block loop.
    _run([3, 2 * BLKS + 100, 4], cap=2 * BLKS + 512)


def test_empty(rng):
    _run([0, 0, 0], cap=8)


def test_many_owners_random(rng):
    counts = rng.integers(0, 9, 400)
    _run(counts, cap=int(counts.sum()) + 37, seed=3)


def test_value_exactness(rng):
    # f32 values (including awkward mantissas) transport bit-exactly
    # through the one-hot matmul (bf16x3 limb decomposition).
    counts = np.array([2, 3], np.int32)
    starts = np.array([0, 2], np.int32)
    vals = np.array([[1.0000001, 3.141592653], [1e-30, 65504.123]],
                    np.float32)
    got = np.asarray(expand_segments(
        jnp.asarray(vals), jnp.asarray(starts), jnp.asarray(counts), 5,
        interpret=True))
    want = _reference(vals, starts, counts, 5)
    assert got.tobytes() == want.tobytes()
