"""Windowed one-hot segmented broadcast (the remainder expansion engine).

Problem: spread column g of a [rows, N] gid-ordered table over the slot
range [starts[g], starts[g] + counts[g]) of a [rows, cap] output — the
"remainder expansion" of tile binning (ops/tiling.py), i.e. repeat each
splat's attributes once per owned slot (reference counterpart:
map_gaussians.rs slot expansion).

The measured v5e cost model (memory: tpu-perf-facts) rules out the obvious
mechanisms: XLA gathers and scatters cost ~13-34 ns PER INDEX regardless of
row width or index sortedness, so both `table[:, owner]` (4M+ indices) and
scatter-at-starts are tens of milliseconds. But the starts are MONOTONE in
gid, so the owners of any contiguous slot block live in a narrow window of
the gid axis. That makes the expansion MXU-shaped:

    for each slot block [BLKS slots]:
        for each owner window [W gids] covering the block's owner range:
            onehot[w, s] = starts[w] <= slot_s < starts[w] + counts[w]
            out_block += table_window @ onehot     # [rows, W] @ [W, BLKS]

The one-hot has exactly one nonzero per in-range slot column, so the matmul
is an EXACT f32 select at HIGHEST precision, and it runs at MXU rate.

The per-block owner range [lo_b, lo_{b+1}] is precomputed with ONE
searchsorted at block granularity (cap/BLKS + 1 queries — the cheap
direction) and fed through scalar prefetch; the kernel walks that range in
W-wide windows with a data-dependent (but tightly bounded) while loop.

Integer transport: values ride the matmul as f32, so starts are split into
12-bit limb rows (exact past 2^24 — the 30M-slot stress regime) appended to
the table by the wrapper; the kernel rebuilds them as int32 after an
eye-matmul transpose puts them on the sublane axis (Mosaic cannot DMA
[W, 1] windows of an int column — minor-dim tiling is 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLKS = 4096     # slots per grid step
W = 256         # owner-window width (gids per DMA)


def _expand_kernel(lo_ref,               # scalar-prefetch [n_blocks+1] i32
                   table_ref,            # [rows_pad, n_pad] f32 ANY
                   out_ref,              # [rows_pad, BLKS] VMEM block
                   tbuf, sem,            # [2, rows_pad, W] VMEM, DMA sems (2,)
                   *, rows_pad: int, r_slo: int, r_shi: int, r_cnt: int):
    b = pl.program_id(0)
    lo = lo_ref[b]
    hi = lo_ref[b + 1]
    w0 = (lo // 128) * 128
    n_win = (hi - w0) // W + 1

    slot0 = b * BLKS
    slots = slot0 + jax.lax.broadcasted_iota(jnp.int32, (1, BLKS), 1)
    # eye[j, k] = (j == k): transposes a [1, W] lane vector to [W, 1] via
    # one tiny matmul (no Mosaic lane->sublane relayout needed).
    jj = jax.lax.broadcasted_iota(jnp.int32, (W, W), 0)
    kk = jax.lax.broadcasted_iota(jnp.int32, (W, W), 1)
    eye = (jj == kk).astype(jnp.float32)

    def to_col(row):                     # [1, W] f32 -> [W, 1] f32, exact
        return jax.lax.dot_general(
            eye, row, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    def dot_onehot(vals, onehot_f32):
        """vals [R, W] f32 @ onehot [W, B] {0,1} -> [R, B] f32, EXACT, as
        three bf16 MXU passes (half of HIGHEST's bf16_6x; Mosaic has no
        Precision.HIGH). Split v = hi + mid + lo where each part is
        bf16-exact (8 mantissa bits each covers f32's 24); the one-hot is
        exact in bf16 (0.0/1.0), each partial product is exact in the f32
        accumulator, and exactly one column term is nonzero."""
        hi = vals.astype(jnp.bfloat16)
        rem = vals - hi.astype(jnp.float32)
        mid = rem.astype(jnp.bfloat16)
        lo = (rem - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        oh = onehot_f32.astype(jnp.bfloat16)
        dims = (((1,), (0,)), ((), ()))
        out = jax.lax.dot_general(hi, oh, dims,
                                  preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(mid, oh, dims,
                                   preferred_element_type=jnp.float32)
        out += jax.lax.dot_general(lo, oh, dims,
                                   preferred_element_type=jnp.float32)
        return out

    def dma(slot, k):
        off = pl.multiple_of(w0 + k * W, 128)
        return pltpu.make_async_copy(
            table_ref.at[:, pl.ds(off, W)], tbuf.at[slot], sem.at[slot])

    dma(0, 0).start()

    def cond(carry):
        k, _ = carry
        return k < n_win

    def body(carry):
        k, acc = carry
        slot = k % 2

        @pl.when(k + 1 < n_win)
        def _():
            dma(1 - slot, k + 1).start()
        dma(slot, k).wait()

        win = tbuf[slot]                                 # [rows_pad, W]
        sc = (to_col(win[r_slo:r_slo + 1]).astype(jnp.int32)
              + to_col(win[r_shi:r_shi + 1]).astype(jnp.int32) * 4096)
        rc = to_col(win[r_cnt:r_cnt + 1]).astype(jnp.int32)
        # No low/high gid guards needed: owners before lo ended their runs
        # at or before slot0, owners after hi start after the block's end —
        # membership is false for them naturally; windows are disjoint.
        onehot = ((sc <= slots) & (slots < sc + rc)
                  ).astype(jnp.float32)                  # [W, BLKS]
        acc = acc + dot_onehot(win, onehot)
        return (k + 1, acc)

    _, acc = jax.lax.while_loop(
        cond, body, (jnp.asarray(0, jnp.int32),
                     jnp.zeros((rows_pad, BLKS), jnp.float32)))
    out_ref[...] = acc


@functools.partial(jax.jit, static_argnames=("cap", "interpret"))
def expand_segments(table, starts, counts, cap: int, interpret: bool = False):
    """Segmented broadcast: out[:, starts[g] : starts[g]+counts[g]] =
    table[:, g:g+1] for every g, zeros elsewhere.

    table: [rows, N] f32 (values must be genuine f32 numbers — split
    >24-bit integers into limb rows). starts: [N] i32 non-decreasing
    (exclusive cumsum of counts). counts: [N] i32 >= 0 (< 2^24). cap:
    static output width; runs crossing cap are truncated, starts past cap
    never emit.
    """
    rows, n = table.shape
    cap_pad = -(-cap // BLKS) * BLKS
    n_blocks = cap_pad // BLKS

    # Owner of slot s = LAST g with starts[g] <= s (zero-count gids share
    # the next real owner's start and precede it, so "last" lands on the
    # real owner; its zero count makes any mismatch inert anyway).
    q = jnp.arange(n_blocks + 1, dtype=jnp.int32) * BLKS
    lo = jnp.maximum(
        jnp.searchsorted(starts, q, side="right").astype(jnp.int32) - 1, 0)

    aug = jnp.concatenate([
        table,
        (starts % 4096).astype(jnp.float32)[None],
        (starts // 4096).astype(jnp.float32)[None],
        counts.astype(jnp.float32)[None],
    ], axis=0)
    rows_aug = rows + 3
    rows_pad = -(-rows_aug // 8) * 8     # Mosaic: slice dim 0 aligned to 8

    n_pad = -(-n // 128) * 128 + W
    # Padded gids carry start 0 / count 0: they never match any slot.
    aug = jnp.pad(aug, ((0, rows_pad - rows_aug), (0, n_pad - n)))

    out = pl.pallas_call(
        functools.partial(_expand_kernel, rows_pad=rows_pad, r_slo=rows,
                          r_shi=rows + 1, r_cnt=rows + 2),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(n_blocks,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((rows_pad, BLKS), lambda b, lo: (0, b)),
            scratch_shapes=[
                pltpu.VMEM((2, rows_pad, W), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((rows_pad, cap_pad), jnp.float32),
        interpret=interpret,
    )(lo, aug)
    return out[:rows, :cap]
