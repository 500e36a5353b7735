"""Microbenchmark: lax.sort / gather variants on the real TPU.

Round-3 scouting for the tile-sort redesign (VERDICT r2 item #1): the
~92 ms 12-operand sort is the frame. Chained-dependency timing (the axon
tunnel makes naive block_until_ready timing lie); every sort output is
consumed so XLA cannot DCE payloads.
"""

import time
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

RESULTS = {}


def chain_time(fn, x0, iters=3, label=""):
    x = fn(x0)
    _ = float(jax.tree_util.tree_leaves(x)[0].ravel()[0:1].sum())
    t0 = time.perf_counter()
    for _ in range(iters):
        x = fn(x)
    _ = float(jax.tree_util.tree_leaves(x)[0].ravel()[0:1].sum())
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:44s} {dt:9.3f} ms", flush=True)
    RESULTS[label] = dt
    return dt


def main():
    rng = np.random.default_rng(0)
    NT = 2040  # 60x34 tiles @1080p/32px
    only = sys.argv[1:] or None

    def want(label):
        return only is None or any(o in label for o in only)

    f0 = jax.jit(lambda x: x + 1)
    chain_time(f0, jnp.zeros((8, 128), jnp.int32), iters=10,
               label="dispatch_floor")

    n = 5_600_000
    tile = jnp.asarray(rng.integers(0, NT, n, dtype=np.int32))
    depth = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    pays = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(10)]

    def consume(outs):
        r = outs[0]
        for p in outs[1:]:
            r = r + p[0].astype(r.dtype)
        return r

    for np_ in (0, 1, 10):
        label = f"sort_5600k_2k_{np_}p"
        if not want(label):
            continue
        def f(t, d=depth, ps=tuple(pays[:np_])):
            return consume(jax.lax.sort((t, d, *ps), num_keys=2,
                                        is_stable=False))
        chain_time(jax.jit(f), tile, label=label)

    if want("sort_5600k_1k_10p"):
        packed = (tile << 20) | (depth >> 12)
        def f1(k, ps=tuple(pays[:10])):
            return consume(jax.lax.sort((k, *ps), num_keys=1,
                                        is_stable=False))
        chain_time(jax.jit(f1), packed, label="sort_5600k_1k_10p")

    # splat-table depth sort at 1M: key + 15 payload rows
    if want("sort_1000k_1k_15p"):
        d1 = jnp.asarray(rng.integers(0, 1 << 30, 1_000_000, dtype=np.int32))
        rows1 = [jnp.asarray(rng.random(1_000_000, dtype=np.float32))
                 for _ in range(15)]
        def fd(d, ps=tuple(rows1)):
            return consume(jax.lax.sort((d, *ps), num_keys=1,
                                        is_stable=False))
        chain_time(jax.jit(fd), d1, label="sort_1000k_1k_15p")
    if want("sort_1000k_1k_1p"):
        d1 = jnp.asarray(rng.integers(0, 1 << 30, 1_000_000, dtype=np.int32))
        g1_ = jnp.arange(1_000_000, dtype=jnp.int32)
        def fd1(d, g=g1_):
            return consume(jax.lax.sort((d, g), num_keys=1, is_stable=False))
        chain_time(jax.jit(fd1), d1, label="sort_1000k_1k_1p")

    # gathers: [1M, 16] table, 5.6M indices
    table = jnp.asarray(rng.random((1_000_000, 16), dtype=np.float32))
    idx_rand_np = rng.integers(0, 1_000_000, n)
    idx_piece = jnp.asarray(np.sort(idx_rand_np.reshape(2000, -1), axis=1)
                            .reshape(-1).astype(np.int32))
    idx_rand = jnp.asarray(idx_rand_np.astype(np.int32))

    def chain_idx(fn, i0, label):
        def wrap(i):
            out, i2 = fn(i)
            return jnp.abs(i2) + (out.ravel()[0] > 2.0).astype(jnp.int32)
        return chain_time(jax.jit(wrap), i0, label=label)

    def g16(i, t=table):
        return t[i], i
    if want("gather_5600k_16rows_piecewise"):
        chain_idx(g16, idx_piece, "gather_5600k_16rows_piecewise")
    if want("gather_5600k_16rows_rand"):
        chain_idx(g16, idx_rand, "gather_5600k_16rows_rand")

    if want("transpose_5600k_16"):
        big = jnp.asarray(rng.random((n, 16), dtype=np.float32))
        def tr(b):
            return b.T.reshape(n, 16)
        chain_time(jax.jit(tr), big, label="transpose_5600k_16")

    with open("/tmp/microbench_sort.json", "w") as fh:
        json.dump(RESULTS, fh, indent=1)


if __name__ == "__main__":
    main()
