"""Sort cost structure probes on the real TPU.

Questions this answers (design inputs for the round-4 payload diet):
  1. Per-operand increment (keys alone vs +1, +5, +9 f32 payloads)
  2. Does payload cost scale per-BYTE or per-OPERAND? (bf16 payloads)
  3. Do batched short sorts beat one long sort? ([B, n] vs [B*n])
Chained-dependency timing; EVERY output is consumed with a full-array
reduction (a [:1] probe lets XLA DCE unused payload outputs — that bug
produced round 3's wrong "sort is 60 ms" attribution in reverse).
Subtract dispatch_floor (~7 ms).
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

    S = 6_291_456  # ~the bench slot count (6.1M), 96k-divisible
    key = jax.random.randint(jax.random.PRNGKey(0), (S,), 0, 2040,
                             dtype=jnp.int32)
    rank = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, 1 << 30,
                              dtype=jnp.int32)
    pay_f32 = [jax.random.normal(jax.random.PRNGKey(i), (S,),
                                 dtype=jnp.float32) for i in range(2, 11)]
    pay_bf16 = [p.astype(jnp.bfloat16) for p in pay_f32]
    key = key.block_until_ready()

    def chain_time(fn, x0, iters=5, label=""):
        x = fn(x0)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        t0 = time.perf_counter()
        for _ in range(iters):
            x = fn(x)
        _ = float(jax.tree_util.tree_leaves(x)[-1].ravel()[0:1].sum())
        dt = (time.perf_counter() - t0) / iters * 1e3
        print(f"{label:36s} {dt:9.3f} ms", flush=True)
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

    def mk(ops_fn, label):
        @jax.jit
        def f(k):
            return consume(ops_fn(k), k)
        chain_time(f, key, label=label)

    mk(lambda k: jax.lax.sort((k, rank), num_keys=2, is_stable=False),
       "sort 2 keys only")
    mk(lambda k: jax.lax.sort((k, rank, pay_f32[0]), num_keys=2,
                              is_stable=False),
       "sort 2k + 1 f32")
    mk(lambda k: jax.lax.sort((k, rank, *pay_f32[:5]), num_keys=2,
                              is_stable=False),
       "sort 2k + 5 f32")
    mk(lambda k: jax.lax.sort((k, rank, *pay_f32), num_keys=2,
                              is_stable=False),
       "sort 2k + 9 f32")
    mk(lambda k: jax.lax.sort((k, rank, *pay_bf16), num_keys=2,
                              is_stable=False),
       "sort 2k + 9 bf16")
    mk(lambda k: jax.lax.sort((k, *pay_f32), num_keys=1, is_stable=False),
       "sort 1k + 9 f32")

    # batched short sorts
    for B in (64, 1024):
        key2 = key.reshape(B, S // B)
        rank2 = rank.reshape(B, S // B)
        pay2 = [p.reshape(B, S // B) for p in pay_f32]

        @jax.jit
        def fb(k, rank2=rank2, pay2=pay2):
            ops = jax.lax.sort((k, rank2, *pay2), num_keys=2,
                               is_stable=False, dimension=1)
            acc = jnp.float32(0.0)
            for o in ops:
                acc = acc + jnp.sum(o.astype(jnp.float32) * 1e-9)
            return k + (0.0 * acc).astype(k.dtype)

        chain_time(fb, key2, label=f"batched [{B} x {S//B//1000}k] 2k+9f32")


if __name__ == "__main__":
    main()
