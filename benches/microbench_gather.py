"""Round-4 decision bench: can a (2-operand sort + payload gather) replace
the payload-carrying sort?

The payload-carrying sort costs ~8 ms per u64 operand at 6.3M slots
(microbench_sortdecide.py). The alternative: sort only (key, gid) and
rebuild the rasterizer SoA with ONE gather of per-splat projected rows
[V, 16] by the sorted gid [S]. This prices that gather in the realistic
index pattern (semi-sorted: ascending-ish within tiles, random across).

Also prices the two-operand sort itself and the end-to-end alternative.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)

    V = 1_000_000
    S = 6_291_456
    kg = jax.random.PRNGKey(0)
    # Semi-sorted index pattern: tiles of ~500 slots each drawing gids from
    # a loose spatial band (models the post-sort gid stream).
    tile_of_slot = (jnp.arange(S) // 512) % 8160
    band = jax.random.randint(kg, (S,), 0, 4096)
    idx = ((tile_of_slot * (V // 8160) + band) % V).astype(jnp.int32)
    rand_idx = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, V,
                                  dtype=jnp.int32)
    rows = jax.random.normal(jax.random.PRNGKey(2), (V, 16), jnp.float32)
    rows_t = jnp.asarray(rows.T)  # [16, V]
    key = jax.random.randint(jax.random.PRNGKey(3), (S,), 0, (1 << 31) - 1,
                             dtype=jnp.int32).astype(jnp.uint32)
    jax.block_until_ready((idx, rows, rows_t, key))

    def chain_time(fn, x0, iters=5, label=""):
        t0c = time.perf_counter()
        x = fn(x0)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        comp = time.perf_counter() - t0c
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:40s} {dt:9.3f} ms   (first call {comp:.0f}s)",
              flush=True)
        return dt

    # Consume the FULL gathered array (sum) so nothing DCEs; keep the
    # carried value's dtype so the chain re-feeds cleanly.
    def consume(x, tail):
        bump = (jnp.sum(x.astype(jnp.float32)) * 1e-30).astype(jnp.int32)
        return tail + bump.astype(tail.dtype)

    @jax.jit
    def f0(i):
        return i + 1
    chain_time(f0, idx, label="dispatch_floor")

    @jax.jit
    def g_rows(i):
        out = jnp.take(rows, i, axis=0)          # [S, 16] row gather
        return consume(out, i)
    chain_time(g_rows, idx, label="row gather [V,16] semi-sorted")
    chain_time(g_rows, rand_idx, label="row gather [V,16] random")

    @jax.jit
    def g_lanes(i):
        out = jnp.take(rows_t, i, axis=1)        # [16, S] lane gather
        return consume(out, i)
    chain_time(g_lanes, idx, label="lane gather [16,V] semi-sorted")

    @jax.jit
    def g_one(i):
        out = jnp.take(rows_t[0], i)             # [S] single-row gather
        return consume(out, i)
    chain_time(g_one, idx, label="single row gather [V] x1")

    @jax.jit
    def sort2(k):
        sk, si = jax.lax.sort((k, idx), num_keys=1, is_stable=False)
        return consume(si.astype(jnp.float32), k)
    chain_time(sort2, key, label="sort key+gid (2 x u32)")

    @jax.jit
    def sort2_gather(k):
        sk, si = jax.lax.sort((k, idx), num_keys=1, is_stable=False)
        out = jnp.take(rows, si, axis=0)
        return consume(out, k)
    chain_time(sort2_gather, key, label="sort 2ops + row gather (e2e alt)")


if __name__ == "__main__":
    main()
