"""Fuzz: NaN/Inf/denormal/extreme/zero-quat injection straight into raw
tensors, asserting no silent corruption (finite image, finite grads).
Mirrors brush-bench-test/tests/fuzz.rs's SplitMix64-seeded poisoning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.render import RenderConfig, camera_inputs, render

IMG = (48, 48)
CFG = RenderConfig(img_size=IMG, sh_degree=1, isect_cap=1 << 12,
                   max_per_tile=128, chunk=32)
CAM = Camera(position=np.array([0.0, 0.0, -4.0]),
             rotation=np.array([1.0, 0.0, 0.0, 0.0]),
             fov_x=0.8, fov_y=0.8)

POISONS = [np.nan, np.inf, -np.inf, 1e38, -1e38, 1e-40, 0.0, -12345.0]


def base_params(rng, n=24):
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    log_scales = np.full((n, 3), np.log(0.2), np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    sh = rng.normal(0, 0.3, (n, 4, 3)).astype(np.float32)
    raw_opac = rng.normal(0.5, 1, n).astype(np.float32)
    return [means, log_scales, quats, sh, raw_opac]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_fuzz_no_silent_corruption(seed):
    rng = np.random.default_rng(seed)
    params = base_params(rng)

    # Poison ~15% of entries across all tensors with pathological values.
    for arr in params:
        flat = arr.reshape(-1)
        k = max(1, int(0.15 * flat.size))
        idx = rng.choice(flat.size, k, replace=False)
        flat[idx] = rng.choice(POISONS, k)
    # A few exactly-zero quats (zero-quat poison, tests/mod.rs).
    params[2][:2] = 0.0

    jparams = tuple(jnp.asarray(p) for p in params)
    cam = camera_inputs(CAM, IMG)

    def loss(ps):
        img, _ = render(*ps, cam, jnp.zeros(3), CFG)
        return jnp.mean(img[..., :3] ** 2), img

    (val, img), grads = jax.value_and_grad(loss, has_aux=True)(jparams)
    assert np.isfinite(np.asarray(img)).all(), "image corrupted"
    assert np.isfinite(float(val))
    for g, name in zip(grads, ["means", "ls", "quats", "sh", "opac"]):
        assert np.isfinite(np.asarray(g)).all(), f"grad {name} corrupted"


def test_poisoned_soa_tail_is_inert():
    """Buffer-poisoning invariant (reference host.rs:52-66 poisons padded
    GPU buffers in test mode): the sorted SoA's tail past the last real
    tile range — sentinel-tile slots plus stack/LANE_PAD padding — is
    documented as 'unspecified garbage, masked inert' (ops/tiling.py).
    Filling it with hostile finite values must leave the forward image,
    every parameter cotangent, the refine weight, and the visibility mask
    bitwise unchanged."""
    import dataclasses

    from tests.test_pallas_parity import setup
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_pallas import rasterize_pallas
    from brush_tpu.ops.tiling import build_intersections

    params, ci, cfg, d = setup()
    cfg = dataclasses.replace(cfg, use_pallas=True)
    bg = jnp.array([0.2, 0.1, 0.3], jnp.float32)
    n = params[0].shape[0]

    proj = project_splats(*params, ci, cfg.img_size, sh_degree=3)
    isect = build_intersections(proj, cfg.img_size, cfg.isect_cap,
                                expand_k0=cfg.expand_k0)
    end = int(np.asarray(isect.tile_ranges)[-1, 1])

    def run(soa):
        def loss(mean2d, conic, color, opac, rh, vh, bgv):
            img = rasterize_pallas(
                mean2d, conic, color, opac, rh, vh, soa,
                isect.tile_ranges, isect.chunk_starts, isect.num_chunks,
                isect.surv_starts_g, isect.surv_counts_g, bgv,
                cfg.img_size, cfg.resolved_chunk_cap(n))
            wmap = jnp.linspace(0.5, 1.5, img.shape[0])[:, None, None]
            return jnp.sum(img * wmap), img

        grads, img = jax.grad(
            loss, argnums=(0, 1, 2, 3, 4, 5, 6), has_aux=True)(
            proj.mean2d, proj.conic, proj.color, proj.opac,
            jnp.zeros(n), jnp.zeros(n), bg)
        return img, grads

    img_clean, g_clean = run(isect.soa)
    poison = isect.soa.at[:, end:].set(-7.7e33)
    img_poison, g_poison = run(poison)

    np.testing.assert_array_equal(np.asarray(img_clean),
                                  np.asarray(img_poison))
    for a, b in zip(g_clean, g_poison):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_degenerate_conic_pallas_grads_finite():
    """An IN-SPAN slot with inf conic entries (a splat whose projected
    covariance went singular — happens on TPU where the f32 determinant
    can round to exactly 0). The forward is safe (its NaN alpha fails the
    gate) but the backward once computed v_sigma(0) * (inf * dx) = NaN on
    a REAL-gid lane — and ONE NaN poisons every later splat through the
    gid-sort reduce's inclusive cumsum (the round-5 quality collapse).
    The mu mask must sit outside every conic/dx product, so the poisoned
    slot contributes exactly zero and every other gradient is UNCHANGED."""
    import dataclasses

    from tests.test_pallas_parity import setup
    from brush_tpu.ops.projection import project_splats
    from brush_tpu.ops.rasterize_pallas import rasterize_pallas
    from brush_tpu.ops.tiling import build_intersections

    params, ci, cfg, d = setup()
    cfg = dataclasses.replace(cfg, use_pallas=True)
    bg = jnp.array([0.2, 0.1, 0.3], jnp.float32)
    n = params[0].shape[0]

    proj = project_splats(*params, ci, cfg.img_size, sh_degree=3)
    isect = build_intersections(proj, cfg.img_size, cfg.isect_cap,
                                expand_k0=cfg.expand_k0)

    def run(soa):
        def loss(mean2d, conic, color, opac, rh, vh, bgv):
            img = rasterize_pallas(
                mean2d, conic, color, opac, rh, vh, soa,
                isect.tile_ranges, isect.chunk_starts, isect.num_chunks,
                isect.surv_starts_g, isect.surv_counts_g, bgv,
                cfg.img_size, cfg.resolved_chunk_cap(n))
            return jnp.sum(img), img

        grads, img = jax.grad(
            loss, argnums=(0, 1, 2, 3, 4, 5, 6), has_aux=True)(
            proj.mean2d, proj.conic, proj.color, proj.opac,
            jnp.zeros(n), jnp.zeros(n), bg)
        return img, grads

    # Silence two in-span slots of the busiest tile (opacity 0: they
    # contribute nothing either way), then poison their conics with inf.
    spans = np.asarray(isect.tile_ranges)
    t = int(np.argmax(spans[:, 1] - spans[:, 0]))
    s0 = int(spans[t, 0])
    soa_base = isect.soa.at[5, s0:s0 + 2].set(0.0)  # opacity row
    img_clean, g_clean = run(soa_base)

    soa_p = soa_base.at[2, s0].set(np.inf)          # conic00 = inf
    soa_p = soa_p.at[4, s0].set(np.inf)             # conic11 = inf
    soa_p = soa_p.at[2, s0 + 1].set(-np.inf)        # and a -inf variant
    img_p, g_p = run(soa_p)

    for a in list(g_p) + [img_p]:
        assert np.isfinite(np.asarray(a)).all(), "NaN/inf leaked"
    np.testing.assert_array_equal(np.asarray(img_clean), np.asarray(img_p))
