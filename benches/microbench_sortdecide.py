"""Round-4 decision bench: what does the tile sort cost under each
candidate shape? Chained timing, full-array consumption, prints each row
as it lands (long compiles expected on first run).

Rows:
  key-only                u32 x 6.3M             (lower bound, 1 operand)
  key+1/3/5 u64           payload operand scaling (fwd diet = 3, train = 5)
  batched [48 x 131k]     row-bucketed candidate (same total elems)
  batched [1536 x 4096]   block-sort candidate
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
    jax.config.update('jax_enable_x64', True)

    S = 6_291_456
    key = jax.random.randint(jax.random.PRNGKey(0), (S,), 0, 1 << 31,
                             dtype=jnp.int32).astype(jnp.uint32)
    pay = [jax.random.randint(jax.random.PRNGKey(i), (S,), 0, 1 << 62,
                              dtype=jnp.int64).astype(jnp.uint64)
           for i in range(1, 6)]
    key = key.block_until_ready()

    def chain_time(fn, x0, iters=5, label=""):
        t_c0 = time.perf_counter()
        x = fn(x0)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:34s} {dt:9.3f} ms   (first call {compile_s:.0f}s)",
              flush=True)
        return dt

    @jax.jit
    def f0(m):
        return m + 1
    chain_time(f0, key, label="dispatch_floor")

    def consume(ops, k):
        acc = jnp.float32(0.0)
        for o in ops:
            acc = acc + jnp.sum(o.astype(jnp.float32) * 1e-9)
        return k + (0.0 * acc).astype(k.dtype)

    def mk(ops_fn, label, x0=key):
        @jax.jit
        def f(k):
            return consume(ops_fn(k), k)
        chain_time(f, x0, label=label)

    mk(lambda k: jax.lax.sort((k,), num_keys=1, is_stable=False),
       "key only")
    mk(lambda k: jax.lax.sort((k, *pay[:1]), num_keys=1, is_stable=False),
       "key + 1 u64")
    mk(lambda k: jax.lax.sort((k, *pay[:3]), num_keys=1, is_stable=False),
       "key + 3 u64")
    mk(lambda k: jax.lax.sort((k, *pay[:5]), num_keys=1, is_stable=False),
       "key + 5 u64")

    for B in (48, 1536):
        key2 = key.reshape(B, S // B)
        pay2 = [p.reshape(B, S // B) for p in pay[:3]]

        def fb(k, pay2=pay2):
            return jax.lax.sort((k, *pay2), num_keys=1, is_stable=False,
                                dimension=1)
        mk(fb, f"batched [{B} x {S//B//1000}k] k+3u64", x0=key2)


if __name__ == "__main__":
    main()
