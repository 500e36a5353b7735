"""Pallas TPU prefix-scan (cumsum / cummax) over long arrays.

The XLA alternatives are pathological at the 8M-element scale the tile
binning pipeline needs: `jax.lax.associative_scan`'s recursive odd/even
decomposition takes the TPU compiler minutes to build, and a flat
Hillis-Steele shift+add ladder materializes log2(n) full-size HBM
round-trips (~23 passes x 33 MB at 8M elements, measured ~23 ms for a max
scan and ~1 s for an 11-row sum scan). A scan is one sequential pass at HBM
bandwidth if the running carry lives on chip — exactly what a Pallas kernel
with a VMEM carry across (sequential) grid steps gives us.

This is the TPU-shaped replacement for the reference's multi-level GPU
prefix-sum (crates/brush-prefix-sum/src/lib.rs:11-83): where the GPU scans
per-workgroup then recursively scans block sums, the TPU scans blocks in
grid order with the block sum carried in VMEM — no recursion, no extra
kernel launches, one HBM read + one write total.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 8192


def _ladder(x, ids, op, identity):
    """Inclusive scan along the lane axis of a [R, BLK] block."""
    lanes = x.shape[1]
    y = x
    shift = 1
    while shift < lanes:
        shifted = jnp.where(ids >= shift, pltpu.roll(y, shift, 1), identity)
        y = op(y, shifted)
        shift *= 2
    return y


def _scan_kernel(x_ref, o_ref, carry, *, op_name: str):
    i = pl.program_id(0)
    rows = x_ref.shape[0]
    if op_name == "sum":
        op, identity = jnp.add, (0 if jnp.issubdtype(x_ref.dtype, jnp.integer)
                                 else 0.0)
    else:
        op = jnp.maximum
        identity = (jnp.iinfo(x_ref.dtype).min
                    if jnp.issubdtype(x_ref.dtype, jnp.integer)
                    else -jnp.inf)

    @pl.when(i == 0)
    def _():
        carry[...] = jnp.full((rows, 1), identity, x_ref.dtype)

    ids = jax.lax.broadcasted_iota(jnp.int32, x_ref.shape, 1)
    y = _ladder(x_ref[...], ids, op, identity)
    y = op(y, carry[...])
    o_ref[...] = y
    carry[...] = y[:, -1:]


@functools.partial(jax.jit, static_argnames=("op", "interpret"))
def scan_rows_pallas(x: jnp.ndarray, op: str = "sum",
                     interpret: bool = False) -> jnp.ndarray:
    """Inclusive prefix scan along axis 1 of [R, L]. op: 'sum' | 'max'.

    L must be a multiple of BLK (callers pad with the op identity); R is
    expected small (<= ~16 rows ride the sublane axis).
    """
    r, l = x.shape
    assert l % BLK == 0, f"scan length {l} must be a multiple of {BLK}"
    grid = l // BLK
    return pl.pallas_call(
        functools.partial(_scan_kernel, op_name=op),
        grid=(grid,),
        in_specs=[pl.BlockSpec((r, BLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((r, BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((r, l), x.dtype),
        scratch_shapes=[pltpu.VMEM((r, 1), x.dtype)],
        interpret=interpret,
    )(x)


def _pad_to_blk(x, identity):
    l = x.shape[-1]
    pad = (-l) % BLK
    if pad == 0:
        return x, l
    pad_block = jnp.full(x.shape[:-1] + (pad,), identity, x.dtype)
    return jnp.concatenate([x, pad_block], axis=-1), l


def cumsum_rows(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inclusive cumsum along axis 1 of [R, L], any L (pads internally)."""
    padded, l = _pad_to_blk(x, 0)
    return scan_rows_pallas(padded, op="sum", interpret=interpret)[:, :l]


def cummax_1d(x: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Inclusive running max of a 1-D array, any length."""
    identity = (jnp.iinfo(x.dtype).min
                if jnp.issubdtype(x.dtype, jnp.integer) else -jnp.inf)
    padded, l = _pad_to_blk(x[None, :], identity)
    return scan_rows_pallas(padded, op="max", interpret=interpret)[0, :l]


def _fill_kernel(x_ref, v_ref, o_ref, carry_x, carry_v):
    """Segmented fill: o[r, j] = x[r, k] for the largest k <= j with
    valid[k]; lanes with no valid predecessor keep the carry init (zeros).
    The combine ((vl, xl), (vr, xr)) -> (vl|vr, vr ? xr : xl) is
    associative, so the Hillis-Steele ladder + a block carry is a valid
    inclusive scan. Selects/rolls are bit-preserving moves, so rows holding
    raw bit patterns (e.g. bitcast depth keys) survive exactly."""
    i = pl.program_id(0)
    rows = x_ref.shape[0]

    @pl.when(i == 0)
    def _():
        carry_x[...] = jnp.zeros((rows, 1), x_ref.dtype)
        carry_v[...] = jnp.zeros((1, 1), jnp.int32)

    ids = jax.lax.broadcasted_iota(jnp.int32, v_ref.shape, 1)
    y = x_ref[...]
    v = v_ref[...]                           # [1, BLK] int32 0/1
    shift = 1
    while shift < y.shape[1]:
        sy = pltpu.roll(y, shift, 1)
        sv = jnp.where(ids >= shift, pltpu.roll(v, shift, 1), 0)
        y = jnp.where(v > 0, y, sy)
        v = v | sv
        shift *= 2
    y = jnp.where(v > 0, y, carry_x[...])
    o_ref[...] = y
    carry_x[...] = y[:, -1:]
    carry_v[...] = v[:, -1:] | carry_v[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fill_rows(x: jnp.ndarray, valid: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Carry fill along axis 1 of [R, L]: each lane takes the row values of
    the nearest valid lane at or before it (zeros before the first valid
    lane). `valid` is [L] int32/bool. One HBM pass — the TPU replacement
    for per-index owner gathers (~13 ns/index at 4M+ slots, measured)."""
    r, l = x.shape
    xp, _ = _pad_to_blk(x, 0)
    vp, _ = _pad_to_blk(valid.astype(jnp.int32)[None, :], 0)
    grid = xp.shape[1] // BLK
    out = pl.pallas_call(
        _fill_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec((r, BLK), lambda i: (0, i)),
                  pl.BlockSpec((1, BLK), lambda i: (0, i))],
        out_specs=pl.BlockSpec((r, BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((r, xp.shape[1]), x.dtype),
        scratch_shapes=[pltpu.VMEM((r, 1), x.dtype),
                        pltpu.VMEM((1, 1), jnp.int32)],
        interpret=interpret,
    )(xp, vp)
    return out[:, :l]


def _stack_kernel(*refs, n_rows: int, total_rows: int):
    o_ref = refs[-1]
    for j in range(n_rows):
        o_ref[j, :] = refs[j][...]
    if total_rows > n_rows:
        o_ref[n_rows:, :] = jnp.zeros(
            (total_rows - n_rows, o_ref.shape[1]), o_ref.dtype)


def stack_rows(rows, total_rows: int, min_len: int,
               interpret: bool = False) -> jnp.ndarray:
    """Stack 1-D f32 arrays into a [total_rows, >=min_len] matrix (rows past
    len(rows) zeroed; lanes past each row's length unspecified garbage —
    callers must mask by their own validity, as the rasterizer does).

    XLA's stack of long 1-D arrays into a row-major matrix measures
    ~5-10 GB/s at the 10-25M-lane scale (strided per-row writes); this
    block-pipelined Pallas copy runs at HBM bandwidth. Output width is
    min_len rounded up to the block size (returned as-is to avoid a
    materializing slice).
    """
    import functools as _ft
    n = len(rows)
    l = rows[0].shape[0]
    blocks = -(-min_len // BLK)
    padded_len = blocks * BLK
    if interpret or jax.default_backend() == "cpu":
        m = jnp.zeros((total_rows, padded_len), jnp.float32)
        return m.at[:n, :min(l, padded_len)].set(
            jnp.stack(rows, axis=0)[:, :padded_len])
    rows = [jnp.concatenate(
        [r, jnp.zeros((padded_len - l,), jnp.float32)]) if l < padded_len
        else r[:padded_len] for r in rows]
    return pl.pallas_call(
        _ft.partial(_stack_kernel, n_rows=n, total_rows=total_rows),
        grid=(blocks,),
        in_specs=[pl.BlockSpec((BLK,), lambda i: (i,)) for _ in rows],
        out_specs=pl.BlockSpec((total_rows, BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((total_rows, padded_len), jnp.float32),
    )(*rows)
