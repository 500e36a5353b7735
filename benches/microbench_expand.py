"""Microbenchmark: the one-hot remainder expansion vs the tile sort,
in isolation, at bench-scene shapes (chained timing, anti-DCE)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)


def chain_time(fn, x0, iters=4, label=""):
    x = fn(x0)
    _ = float(jax.tree_util.tree_leaves(x)[0].ravel()[0:1].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(jax.tree_util.tree_leaves(x)[0].ravel()[0:1].sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:9.3f} ms", flush=True)
    return dt


def main():
    from brush_tpu.ops.expand_pallas import expand_segments

    rng = np.random.default_rng(0)
    n = 1_000_000
    rem_cap = 4_194_304

    chain_time(jax.jit(lambda x: x + 1), jnp.zeros((8, 128), jnp.int32),
               iters=10, label="dispatch_floor")

    # Remainder counts like the bench scene: most splats have a small
    # excess, some have none.
    counts = np.maximum(rng.poisson(4.0, n).astype(np.int32) - 2, 0)
    total = int(counts.sum())
    print(f"remainder slots needed: {total} (cap {rem_cap})", flush=True)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    table = rng.random((17, n), dtype=np.float32)
    starts_j = jnp.asarray(starts)
    counts_j = jnp.asarray(counts)

    def fexp(t):
        filled = expand_segments(t, starts_j, counts_j, rem_cap)
        return t + filled[:, :1] * 0.0
    chain_time(jax.jit(fexp), jnp.asarray(table), label="expand_17rows_4M")

    # The tile sort at the same scale: 6.2M slots x (2 keys + 10 payloads).
    s = 6_194_304
    tile = jnp.asarray(rng.integers(0, 2040, s, dtype=np.int32))
    rank = jnp.asarray(rng.integers(0, 1 << 30, s, dtype=np.int32))
    pays = [jnp.asarray(rng.random(s, dtype=np.float32)) for _ in range(10)]

    def fsort(t):
        out = jax.lax.sort((t, rank, *pays), num_keys=2, is_stable=False)
        r = out[0]
        for p in out[1:]:
            r = r + p[0].astype(r.dtype)
        return r
    chain_time(jax.jit(fsort), tile, label="sort_6194k_2k_10p")


if __name__ == "__main__":
    main()
