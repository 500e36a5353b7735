"""Pallas production kernels vs the jnp oracle: forward images and the full
hand-derived backward (parameter grads, refine weight, visibility mask).
Runs in Pallas interpret mode on CPU; the same comparison passes on real TPU
(see .claude/skills/verify/SKILL.md)."""

import dataclasses
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file

from brush_tpu.camera import Camera
from brush_tpu.render import (RenderConfig, camera_inputs, render,
                              render_with_refine)

DATA = pathlib.Path(__file__).parent / "data"


def setup(name="basic_case"):
    d = load_file(DATA / f"{name}.safetensors")
    h, w = d["out_img"].shape[:2]
    focal = (w / 2.0) / np.tan(np.pi / 4.0)
    cam = Camera(position=np.array([0.123, 0.456, -8.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=np.pi / 2, fov_y=2 * np.arctan((h / 2.0) / focal))
    ci = camera_inputs(cam, (w, h))
    params = (jnp.asarray(d["means"]), jnp.asarray(d["scales"]),
              jnp.asarray(d["quats"]), jnp.asarray(d["coeffs"]),
              jnp.asarray(d["opacities"]))
    cfg = RenderConfig(img_size=(w, h), sh_degree=3, isect_cap=1 << 14,
                       max_per_tile=64)
    return params, ci, cfg, d


def test_pallas_forward_matches_jnp():
    params, ci, cfg, d = setup()
    bg = jnp.array([0.3, 0.2, 0.1], jnp.float32)
    n = params[0].shape[0]
    rh, vh = jnp.zeros(n), jnp.zeros(n)
    img_j, _ = render_with_refine(*params, ci, bg, cfg, rh, vh)
    img_p, _ = render_with_refine(
        *params, ci, bg, dataclasses.replace(cfg, use_pallas=True), rh, vh)
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                               atol=2e-6, rtol=1e-5)


def test_pallas_backward_matches_jnp():
    params, ci, cfg, d = setup()
    bg = jnp.array([0.1, 0.25, 0.4], jnp.float32)
    n = params[0].shape[0]

    def make_loss(cfg):
        def loss(params, rh, vh):
            img, _ = render_with_refine(*params, ci, bg, cfg, rh, vh)
            wmap = jnp.linspace(0.5, 1.5, img.shape[0])[:, None, None]
            return jnp.sum(img * wmap * jnp.array([1.0, 0.8, 0.6, 0.4]))
        return loss

    rh, vh = jnp.zeros(n), jnp.zeros(n)
    lj, gj = jax.value_and_grad(make_loss(cfg), argnums=(0, 1, 2))(params, rh, vh)
    lp, gp = jax.value_and_grad(
        make_loss(dataclasses.replace(cfg, use_pallas=True)),
        argnums=(0, 1, 2))(params, rh, vh)

    assert abs(float(lj) - float(lp)) / abs(float(lj)) < 1e-6
    for a, b in zip(jax.tree_util.tree_leaves(gp[0]),
                    jax.tree_util.tree_leaves(gj[0])):
        a, b = np.asarray(a), np.asarray(b)
        scale = np.abs(b).max() + 1e-12
        assert np.abs(a - b).max() / scale < 1e-5, "param grad mismatch"
    # Refine weight.
    a, b = np.asarray(gp[1]), np.asarray(gj[1])
    assert np.abs(a - b).max() / (np.abs(b).max() + 1e-12) < 1e-5
    # Visibility mask: exact.
    np.testing.assert_array_equal(np.asarray(gp[2]), np.asarray(gj[2]))


def _synth(rng, n, spread, opac, img=(64, 48)):
    from brush_tpu.ops.sh import rgb_to_sh_dc
    means = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    sh = np.asarray(rgb_to_sh_dc(rng.uniform(0, 1, (n, 1, 3)))).astype(np.float32)
    params = (jnp.asarray(means),
              jnp.full((n, 3), np.log(0.2), jnp.float32),
              jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1)),
              jnp.asarray(sh),
              jnp.full((n,), opac, jnp.float32))
    cam = Camera(position=np.array([0.0, 0.0, -5.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9 * img[1] / img[0])
    ci = camera_inputs(cam, img)
    cfg = RenderConfig(img_size=img, sh_degree=0, isect_cap=1 << 13,
                       max_per_tile=1024)
    return params, ci, cfg


def _fwd_both(params, ci, cfg, bg):
    n = params[0].shape[0]
    rh, vh = jnp.zeros(n), jnp.zeros(n)
    img_j, aux = render_with_refine(*params, ci, bg, cfg, rh, vh)
    img_p, _ = render_with_refine(
        *params, ci, bg, dataclasses.replace(cfg, use_pallas=True), rh, vh)
    return np.asarray(img_j), np.asarray(img_p), aux


def test_pallas_empty_and_corner_tiles():
    """Splats clustered in one corner: most tiles empty, parity holds."""
    rng = np.random.default_rng(1)
    params, ci, cfg = _synth(rng, 40, 0.3, 1.0)
    params = (params[0] + jnp.array([1.8, 1.4, 0.0]),) + params[1:]
    img_j, img_p, _ = _fwd_both(params, ci, cfg, jnp.zeros(3))
    np.testing.assert_allclose(img_p, img_j, atol=2e-6, rtol=1e-5)


def test_pallas_opaque_wall_early_exit():
    """Hundreds of stacked near-opaque splats: the whole-tile saturation
    early-exit (and its in-flight DMA drain) must not corrupt output."""
    rng = np.random.default_rng(2)
    params, ci, cfg = _synth(rng, 512, 0.8, 8.0)  # sigmoid(8) ~ 0.9997
    img_j, img_p, aux = _fwd_both(params, ci, cfg, jnp.ones(3))
    # The covered center saturates (corners may be empty).
    assert float(img_j[20:28, 28:36, 3].min()) > 0.99
    assert int(aux.max_isects_per_tile) <= cfg.max_per_tile
    np.testing.assert_allclose(img_p, img_j, atol=2e-6, rtol=1e-5)


def test_pallas_backward_with_saturation():
    rng = np.random.default_rng(3)
    params, ci, cfg = _synth(rng, 256, 0.8, 6.0)
    bg = jnp.array([0.2, 0.2, 0.2], jnp.float32)
    n = params[0].shape[0]

    def make_loss(cfg):
        def loss(params):
            rh, vh = jnp.zeros(n), jnp.zeros(n)
            img, _ = render_with_refine(*params, ci, bg, cfg, rh, vh)
            return jnp.mean(img ** 2)
        return loss

    gj = jax.grad(make_loss(cfg))(params)
    gp = jax.grad(make_loss(dataclasses.replace(cfg, use_pallas=True)))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gj)):
        a, b = np.asarray(a), np.asarray(b)
        # Absolute floor: saturated scenes drive some grads to ~0 where a
        # relative test is meaningless noise-vs-noise.
        tol = max(2e-5 * float(np.abs(b).max()), 1e-8)
        assert np.abs(a - b).max() < tol


def test_pallas_forward_only_matches_training_kernel():
    """The fwd_only specialization (no gid payload, no surv cumsums, 4-row
    tile output, rasterize.rs:172-177 comptime variant) skips bookkeeping
    AND diets the sort payload to u16 precision (tiling_key.pack_fwd_rows)
    — the viewer-path analogue of the reference's packed-u8x4 fwd-only
    output. The image must match the training-path kernel to well under the
    1/255 output quantization step (error budget in pack_fwd_rows)."""
    from brush_tpu.render import render
    params, ci, cfg, d = setup()
    bg = jnp.array([0.3, 0.2, 0.1], jnp.float32)
    img_t, _ = render(*params, ci, bg,
                      dataclasses.replace(cfg, use_pallas=True))
    img_f, aux = render(*params, ci, bg,
                        dataclasses.replace(cfg, use_pallas=True,
                                            forward_only=True))
    a, b = np.asarray(img_f), np.asarray(img_t)
    assert np.abs(a - b).max() < 2.0 / 255.0
    assert np.abs(a - b).mean() < 2e-4
    # Overflow-retry aux still reported on the fwd-only path.
    assert int(aux.num_isects) >= 0


def test_pallas_tile_step_padding_odd_tile_count():
    """The multi-tile grid step (TPG tiles/step) pads the trailing partial
    step with span-0 tiles; an image whose tile count is NOT a TPG
    multiple must still match the jnp oracle exactly."""
    from brush_tpu.constants import TILE_WIDTH
    from brush_tpu.ops.rasterize_pallas import TPG
    params, ci, cfg, d = setup()
    img_size = (3 * TILE_WIDTH, 7 * TILE_WIDTH)       # 21 tiles
    assert (21 % TPG) != 0
    from brush_tpu.render import camera_inputs as _ci
    from brush_tpu.camera import Camera as _Cam
    import numpy as _np
    cam = _Cam(position=_np.array([0.123, 0.456, -8.0]),
               rotation=_np.array([1.0, 0.0, 0.0, 0.0]),
               fov_x=_np.pi / 2, fov_y=_np.pi / 2 * 7 / 3)
    ci2 = _ci(cam, img_size)
    cfg2 = dataclasses.replace(cfg, img_size=img_size)
    bg = jnp.array([0.1, 0.5, 0.9], jnp.float32)
    img_j, _ = render(*params, ci2, bg, cfg2)
    img_p, _ = render(*params, ci2, bg,
                      dataclasses.replace(cfg2, use_pallas=True))
    np.testing.assert_allclose(np.asarray(img_p), np.asarray(img_j),
                               atol=2e-6, rtol=1e-5)
    img_f, _ = render(*params, ci2, bg,
                      dataclasses.replace(cfg2, use_pallas=True,
                                          forward_only=True))
    assert np.abs(np.asarray(img_f) - np.asarray(img_p)).max() < 2.0 / 255.0
