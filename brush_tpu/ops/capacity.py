"""Capacity auto-planning: size the tile-sort slot space from the scene.

The reference sizes every intersection buffer exactly, per frame, with a
mid-pipeline GPU->CPU readback (brush-render/src/render.rs:146-167). The
TPU pipeline is one statically-shaped jit program, so capacities are compile
-time constants — but nothing says they must be *guessed*. This module runs
a cheap jitted counting pass (projection geometry only, no SH) and picks

  * ``expand_k0``  — the dense per-splat expansion width, minimizing the
    measured per-slot cost model: every slot (dense or remainder) costs one
    sort visit (~11 ns at 12 operands), and each remainder-capacity slot
    additionally pays the windowed one-hot expansion (~3.5 ns);
  * ``isect_cap``  — the remainder slot capacity, rounded up to a coarse
    {2^k, 1.5*2^k} grid so recompiles stay rare while padding waste is
    bounded by ~1.26x.

Round-1 measurement showed the unplanned bench config sorted 24.8M slots
for 14.6M real intersections — a 1.7x sentinel tax this pass removes.
"""

from __future__ import annotations

import functools

import numpy as np

# Relative per-slot costs, v5e round-3 measurements (benches/microbench_*):
# lax.sort moves ~0.9 ns/elem/operand (x12 operands), and the windowed
# one-hot expansion kernel costs ~3.5 ns per REMAINDER-CAPACITY slot
# (blocks scale with the cap, not the live count).
_SORT_NS_PER_SLOT = 11.0
_EXPAND_NS_PER_CAP = 3.5

_K0_CANDIDATES = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32)


def round_cap(n: int, minimum: int = 1 << 13) -> int:
    """Round up to the {2^k, 1.5*2^k} grid (bounded compile-cache churn,
    padding waste <= 1.26x)."""
    n = max(int(n), minimum)
    p = 1 << max(int(np.ceil(np.log2(n))) - 1, 0)
    for cap in (p, p + p // 2, 2 * p, 3 * p):
        if cap >= n:
            return cap
    return 4 * p


@functools.lru_cache(maxsize=16)
def _count_fn(img_size, model, mip_splatting, k0s):
    import jax
    import jax.numpy as jnp
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.tiling import exact_tile_counts

    def count(means, log_scales, quats, raw_opacities, cam):
        sh0 = jnp.zeros((means.shape[0], 1, 3), jnp.float32)
        proj = project_splats(means, log_scales, quats, sh0, raw_opacities,
                              cam, img_size, sh_degree=0,
                              model=model, mip_splatting=mip_splatting)
        # Exact-hit counts, the same bitwise formula emission uses — bbox
        # counts would over-provision the remainder by ~1.4-1.7x.
        _, cnt = exact_tile_counts(proj)
        rems = jnp.stack([jnp.sum(jnp.maximum(cnt - k, 0)) for k in k0s])
        return rems, jnp.sum(cnt), jnp.max(cnt)

    return jax.jit(count)


def plan_caps(
    means,
    log_scales,
    quats,
    raw_opacities,
    cam_inputs,
    img_size: tuple[int, int],
    *,
    model=None,
    mip_splatting: bool = False,
    margin: float = 1.1,
) -> tuple[int, int]:
    """Pick (expand_k0, isect_cap) for this scene+view.

    ``cam_inputs`` is a CameraInputs (see render.camera_inputs). The margin
    covers view-to-view variation; callers that sweep cameras should plan on
    the worst view or rely on the overflow-retry loop.
    """
    from brush_tpu.camera import Pinhole
    model = Pinhole() if model is None else model

    fn = _count_fn(tuple(img_size), model, bool(mip_splatting),
                   _K0_CANDIDATES)
    rems, total, _mx = fn(means, log_scales, quats, raw_opacities, cam_inputs)
    rems = np.asarray(rems)

    n = means.shape[0]
    best_k0, best_cost, best_cap = 1, float("inf"), 0
    for k0, rem in zip(_K0_CANDIDATES, rems):
        cap = round_cap(int(rem * margin))
        cost = (_SORT_NS_PER_SLOT * (n * k0 + cap)
                + _EXPAND_NS_PER_CAP * cap)
        if cost < best_cost:
            best_k0, best_cost, best_cap = k0, cost, cap
    return best_k0, best_cap
