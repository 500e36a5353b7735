"""Decide the round-3 sort redesign: measure on the real chip
  (a) row-gather rate: take a [N,16] f32 AoS table at 5.6M semi-sorted
      indices (what a 3-operand sort + payload rebuild would pay),
  (b) per-row gather (9 separate [N] gathers, same indices),
  (c) single-i64-key sort vs 2-key i32 sort (comparator width),
  (d) batched band sort [S, n/S] vs flat sort (log^2 scaling),
  (e) AoS [M,16] -> [16,M] transpose cost.
Chained-dependency timing (axon block_until_ready lies; feed each iter's
output back in so the wall clock covers real device work).
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

N = 1_000_000
M = 5_600_000
S = 32


def chain_time(fn, x0, iters=8, label=""):
    x = fn(x0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    x = x0
    for _ in range(iters):
        x = fn(x)
    jax.block_until_ready(x)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:>40} {dt:10.3f} ms", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    # dispatch floor
    chain_time(jax.jit(lambda x: x + 1.0), jnp.zeros((8, 128)), 8,
               "dispatch_floor")

    # semi-sorted indices: tile-clustered (sorted within 690 tile groups)
    idx = rng.integers(0, N, size=M).astype(np.int32)
    idx_semi = np.sort(idx.reshape(8000, -1), axis=1).reshape(-1)
    idxj = jnp.asarray(idx_semi)

    table = jnp.asarray(rng.standard_normal((N, 16)).astype(np.float32))
    rows9 = [jnp.asarray(rng.standard_normal(N).astype(np.float32))
             for _ in range(9)]

    def take_rows(i):
        out = jnp.take(table, i, axis=0)
        return (i + out[:, 0].astype(jnp.int32) % 2).astype(jnp.int32)
    chain_time(jax.jit(take_rows), idxj, 8, "gather_rows16_5600k")

    def take_9x1(i):
        acc = i
        for r in rows9:
            acc = acc + jnp.take(r, i).astype(jnp.int32) % 2
        return acc
    chain_time(jax.jit(take_9x1), idxj, 8, "gather_9x1row_5600k")

    # sorts: 2-key i32 + 10 payloads vs 1-key i64 + 10 payloads
    tile = jnp.asarray(rng.integers(0, 8160, M).astype(np.int32))
    depth = jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32))
    pay = [jnp.asarray(rng.standard_normal(M).astype(np.float32))
           for _ in range(10)]

    def sort_2k(t):
        out = jax.lax.sort((t, depth, *pay), num_keys=2, is_stable=False)
        return out[0]
    chain_time(jax.jit(sort_2k), tile, 4, "sort_2k_i32_10p")

    key64 = (tile.astype(jnp.int64) << 32) | depth.astype(jnp.uint32).astype(jnp.int64)

    def sort_1k64(k):
        out = jax.lax.sort((k, *pay), num_keys=1, is_stable=False)
        return out[0]
    chain_time(jax.jit(sort_1k64), key64, 4, "sort_1k_i64_10p")

    def sort_1k64_1p(k):
        out = jax.lax.sort((k, pay[0]), num_keys=1, is_stable=False)
        return out[0]
    chain_time(jax.jit(sort_1k64_1p), key64, 4, "sort_1k_i64_1p")

    def sort_2k_1p(t):
        out = jax.lax.sort((t, depth, pay[0]), num_keys=2, is_stable=False)
        return out[0]
    chain_time(jax.jit(sort_2k_1p), tile, 4, "sort_2k_i32_1p")

    # batched band sort: [S, M/S] along axis 1, 12 operands
    ms = M // S
    tile_b = tile[: S * ms].reshape(S, ms)
    depth_b = depth[: S * ms].reshape(S, ms)
    pay_b = [p[: S * ms].reshape(S, ms) for p in pay]

    def sort_band(t):
        out = jax.lax.sort((t, depth_b, *pay_b), num_keys=2,
                           is_stable=False, dimension=1)
        return out[0]
    chain_time(jax.jit(sort_band), tile_b, 4, f"sort_band{S}_2k_10p")

    def sort_band_3op(t):
        out = jax.lax.sort((t, depth_b, pay_b[0]), num_keys=2,
                           is_stable=False, dimension=1)
        return out[0]
    chain_time(jax.jit(sort_band_3op), tile_b, 4, f"sort_band{S}_2k_1p")

    # AoS -> SoA transpose
    aos = jnp.asarray(rng.standard_normal((M, 16)).astype(np.float32))

    def tr(a):
        t = a.T
        return t + 0.0  # force materialization

    def tr_chain(a):
        return tr(aos + a[0, :1])
    chain_time(jax.jit(lambda a: (aos + a[:1, :1]).T + 0.0), aos[:8, :8], 4,
               "transpose_aos16_5600k")


if __name__ == "__main__":
    main()
