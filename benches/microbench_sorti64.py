"""Do wide (i64) sort payloads cost per-operand or per-byte on TPU?

If an i64 payload costs ~one f32 operand, packing f32 pairs into i64
halves the tile-sort's payload bill (9-10 f32 rows -> 5 i64 rows).
Also probes the combined single-u32-key variant and the end-state
candidate: 1 key + 5 i64. Chained timing; all outputs consumed.
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
    key = jax.random.randint(jax.random.PRNGKey(0), (S,), 0, 2040,
                             dtype=jnp.int32)
    rank = jax.random.randint(jax.random.PRNGKey(1), (S,), 0, 1 << 30,
                              dtype=jnp.int32)
    ckey = (key.astype(jnp.uint32) << jnp.uint32(21)
            | (rank.astype(jnp.uint32) >> jnp.uint32(11)))
    pay_f32 = [jax.random.normal(jax.random.PRNGKey(i), (S,),
                                 dtype=jnp.float32) for i in range(2, 12)]
    # pack f32 pairs -> i64 (lo | hi<<32)
    pay_i64 = []
    for i in range(0, 10, 2):
        lo = jax.lax.bitcast_convert_type(pay_f32[i], jnp.uint32)
        hi = jax.lax.bitcast_convert_type(pay_f32[i + 1], jnp.uint32)
        pay_i64.append((lo.astype(jnp.uint64)
                        | (hi.astype(jnp.uint64) << jnp.uint64(32))))
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
            acc = acc + jnp.sum((o & jnp.uint64(0xFFFF) if o.dtype ==
                                 jnp.uint64 else o).astype(jnp.float32)
                                * 1e-9)
        return k + (0.0 * acc).astype(k.dtype)

    def mk(ops_fn, label):
        # payloads ride as ARGUMENTS: closing over device arrays embeds
        # them as HLO constants, which blows the remote-compile request cap
        @jax.jit
        def f(k, *pays):
            return consume(ops_fn(k, pays), k)

        def g(k):
            return f(k, *pays_for(label))
        chain_time(g, key, label=label)

    def pays_for(label):
        return pay_i64 if "i64" in label else pay_f32

    mk(lambda k, ps: jax.lax.sort((k, rank, ps[0]), num_keys=2,
                                  is_stable=False),
       "sort 2k + 1 i64")
    mk(lambda k, ps: jax.lax.sort((k, rank, *ps), num_keys=2,
                                  is_stable=False),
       "sort 2k + 5 i64")
    mk(lambda k, ps: jax.lax.sort((ckey, *ps), num_keys=1,
                                  is_stable=False),
       "sort 1xu32key + 5 i64")
    mk(lambda k, ps: jax.lax.sort((ckey, *ps), num_keys=1,
                                  is_stable=False),
       "sort 1xu32key + 10 f32")
    # batched variant of the candidate end state
    B = 1024
    ckey2 = ckey.reshape(B, S // B)
    pay2 = [p.reshape(B, S // B) for p in pay_i64]

    @jax.jit
    def fb(k, *pay2):
        ops = jax.lax.sort((ckey2, *pay2), num_keys=1, is_stable=False,
                           dimension=1)
        acc = jnp.float32(0.0)
        for o in ops:
            acc = acc + jnp.sum((o & jnp.uint64(0xFFFF) if o.dtype ==
                                 jnp.uint64 else o).astype(jnp.float32)
                                * 1e-9)
        return k + (0.0 * acc).astype(k.dtype)

    chain_time(lambda k: fb(k, *pay2), key,
               label="batched [1024x6k] 1key + 5 i64")


if __name__ == "__main__":
    main()
