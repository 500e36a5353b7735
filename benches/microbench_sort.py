"""Microbenchmark: lax.sort / gather / scatter variants on the real TPU.

Round-3 scouting for the tile-sort redesign (VERDICT r2 item #1): the
92 ms 12-operand sort is the frame. Measures how sort cost scales with
element count, operand count, key count, stability, and what the
alternatives (gather-rebuild, histogram) would cost.
"""

import time
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')


def timeit(fn, *args, iters=5, _name=[None]):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


class PrintDict(dict):
    def __setitem__(self, k, v):
        print(f"{k:40s} {v:9.3f} ms", flush=True)
        super().__setitem__(k, v)


def main():
    rng = np.random.default_rng(0)
    results = PrintDict()
    NT = 2040  # 60x34 tiles @1080p/32px

    for n in (1_400_000, 5_600_000):
        tile = jnp.asarray(rng.integers(0, NT, n, dtype=np.int32))
        depth = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
        pays = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(10)]
        tag = f"n{n//1000}k"

        # 2 keys + varying payload count
        for np_ in (0, 1, 4, 10):
            f = jax.jit(lambda t, d, *p: jax.lax.sort(
                (t, d, *p), num_keys=2, is_stable=False))
            results[f"sort_{tag}_2k_{np_}p"] = timeit(f, tile, depth, *pays[:np_])

        # 1 key (packed) + 10 payloads
        packed = (tile << 20) | (depth >> 10)
        f1 = jax.jit(lambda k, *p: jax.lax.sort(
            (k, *p), num_keys=1, is_stable=False))
        results[f"sort_{tag}_1k_10p"] = timeit(f1, packed, *pays)
        results[f"sort_{tag}_1k_1p"] = timeit(f1, packed, pays[0])

        # stable vs not, 1 key 10 payloads
        fs = jax.jit(lambda k, *p: jax.lax.sort(
            (k, *p), num_keys=1, is_stable=True))
        results[f"sort_{tag}_1k_10p_stable"] = timeit(fs, packed, *pays)

        # f32 payloads vs i32 keys all-f32?  bf16 payloads:
        pays_bf = [p.astype(jnp.bfloat16) for p in pays]
        results[f"sort_{tag}_1k_10p_bf16"] = timeit(f1, packed, *pays_bf)

        # gather rebuild: table [1M, 16] f32, n random indices (tile-grouped)
        table = jnp.asarray(rng.random((1_000_000, 16), dtype=np.float32))
        idx_sorted_by_tile = jnp.asarray(
            rng.integers(0, 1_000_000, n, dtype=np.int32))
        g = jax.jit(lambda t, i: t[i])
        results[f"gather_{tag}_16rows"] = timeit(g, table, idx_sorted_by_tile)
        g1 = jax.jit(lambda t, i: t[i, 0])
        results[f"gather_{tag}_1row"] = timeit(g1, table, idx_sorted_by_tile)

        # histogram of tile ids (for counting-sort feasibility)
        h = jax.jit(lambda t: jnp.zeros(NT, jnp.int32).at[t].add(1))
        results[f"scatter_hist_{tag}"] = timeit(h, tile)

        # segment boundaries via searchsorted on sorted tiles
        tile_s = jnp.sort(tile)
        ss = jax.jit(lambda ts: jnp.searchsorted(
            ts, jnp.arange(NT + 1, dtype=jnp.int32)))
        results[f"searchsorted_{tag}"] = timeit(ss, tile_s)

    # small sort: splat-level depth sort 1M x {2, 17} operands
    n = 1_000_000
    depth = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.int32))
    gid = jnp.arange(n, dtype=jnp.int32)
    rows = [jnp.asarray(rng.random(n, dtype=np.float32)) for _ in range(15)]
    f = jax.jit(lambda d, g: jax.lax.sort((d, g), num_keys=1, is_stable=False))
    results["sort_1000k_1k_1p"] = timeit(f, depth, gid)
    f = jax.jit(lambda d, *p: jax.lax.sort((d, *p), num_keys=1, is_stable=False))
    results["sort_1000k_1k_16p"] = timeit(f, depth, gid, *rows)

    for k, v in sorted(results.items()):
        print(f"{k:40s} {v:9.3f} ms", flush=True)
    with open("/tmp/microbench_sort.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
