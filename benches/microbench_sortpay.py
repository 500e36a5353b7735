"""Honest sort payload costs (microbench_sortalt let XLA prune unused sort
outputs — sort_2k_1p == sort_2k_10p gave it away). Every operand's output
feeds the chained value here, so nothing can be DCE'd. Decides:
  * i64 single key vs (i32, i32) two keys,
  * f32 payloads vs i64-packed payload pairs (halve operand count),
at the bench pipeline's real volume.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_enable_x64", True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp
import numpy as np

M = 5_600_000


def chain_time(fn, x0, iters=6, label=""):
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


def consume(outs, t):
    acc = jnp.zeros((), jnp.float32)
    for o in outs:
        acc = acc + o[0].astype(jnp.float32)
    return t + (acc * 0).astype(t.dtype)


def main():
    rng = np.random.default_rng(0)
    chain_time(jax.jit(lambda x: x + 1), jnp.zeros((8, 128), jnp.int32), 6,
               "dispatch_floor")

    tile = jnp.asarray(rng.integers(0, 8160, M).astype(np.int32))
    depth = jnp.asarray(rng.integers(0, 2**30, M).astype(np.int32))
    pay = [jnp.asarray(rng.standard_normal(M).astype(np.float32))
           for _ in range(10)]

    def sort_2k_10p(t):
        outs = jax.lax.sort((t, depth, *pay), num_keys=2, is_stable=False)
        return consume(outs, t)
    chain_time(jax.jit(sort_2k_10p), tile, 6, "sort_2k_i32_10f32")

    key64 = ((tile.astype(jnp.int64) << 32)
             | depth.astype(jnp.uint32).astype(jnp.int64))

    def sort_1k64_10p(k):
        outs = jax.lax.sort((k, *pay), num_keys=1, is_stable=False)
        return consume(outs, k)
    chain_time(jax.jit(sort_1k64_10p), key64, 6, "sort_1k_i64_10f32")

    # pack payload pairs into i64 (bitcast both halves; exact transport)
    def pack2(a, b):
        ai = jax.lax.bitcast_convert_type(a, jnp.int32)
        bi = jax.lax.bitcast_convert_type(b, jnp.int32)
        return (ai.astype(jnp.uint32).astype(jnp.int64)
                | (bi.astype(jnp.uint32).astype(jnp.int64) << 32))

    pay64 = [pack2(pay[2 * i], pay[2 * i + 1]) for i in range(5)]

    def sort_1k64_5p64(k):
        outs = jax.lax.sort((k, *pay64), num_keys=1, is_stable=False)
        # include the unpack cost: both halves back to f32
        acc = jnp.zeros((), jnp.float32)
        for o in outs[1:]:
            lo = jax.lax.bitcast_convert_type(
                (o & jnp.int64(0xffffffff)).astype(jnp.uint32), jnp.float32)
            hi = jax.lax.bitcast_convert_type(
                (o >> jnp.int64(32)).astype(jnp.uint32), jnp.float32)
            acc = acc + lo[0] + hi[0]
        return k + (acc * 0).astype(k.dtype) + outs[0] * 0
    chain_time(jax.jit(sort_1k64_5p64), key64, 6, "sort_1k_i64_5xi64pack")

    def sort_1k32_10p(t):
        outs = jax.lax.sort((t, *pay), num_keys=1, is_stable=False)
        return consume(outs, t)
    chain_time(jax.jit(sort_1k32_10p), tile, 6, "sort_1k_i32_10f32")

    # volume scaling check: 4.0M (exact-count emission regime)
    M2 = 4_000_000
    t2 = tile[:M2]
    d2 = depth[:M2]
    p2 = [p[:M2] for p in pay]

    def sort_2k_10p_4m(t):
        outs = jax.lax.sort((t, d2, *p2), num_keys=2, is_stable=False)
        return consume(outs, t)
    chain_time(jax.jit(sort_2k_10p_4m), t2, 6, "sort_2k_i32_10f32_4M")


if __name__ == "__main__":
    main()
