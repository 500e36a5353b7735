"""Per-camera-model smoke renders (KB4 / RT8 / ThinPrism), mirroring the
reference's camera-model tests (brush-render/src/tests/mod.rs), plus
focal<->fov inversion roundtrips (camera.rs:86-198)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import (
    Camera, KannalaBrandt4, Pinhole, RadialTangential8, ThinPrismFisheye,
    focal_to_fov, fov_to_focal,
)
from brush_tpu.ops.sh import rgb_to_sh_dc
from brush_tpu.render import RenderConfig, camera_inputs, render

MODELS = [
    Pinhole(),
    KannalaBrandt4(k1=0.05, k2=-0.01, k3=0.002, k4=-0.0005),
    RadialTangential8(k1=0.1, k2=-0.02, p1=0.001, p2=-0.002),
    ThinPrismFisheye(k1=0.05, k2=-0.01, p1=0.001, p2=0.001,
                     sx1=0.0005, sy1=-0.0005),
]


@pytest.mark.parametrize("model", MODELS, ids=lambda m: type(m).__name__)
def test_focal_fov_roundtrip(model):
    for fov in [0.4, 0.9, 1.4]:
        f = fov_to_focal(fov, 640, model)
        back = focal_to_fov(f, 640, model)
        assert abs(back - fov) < 1e-6


@pytest.mark.parametrize("model", MODELS, ids=lambda m: type(m).__name__)
def test_smoke_render_and_grads(model, rng):
    n = 48
    means = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
    log_scales = np.full((n, 3), np.log(0.15), np.float32)
    quats = rng.normal(0, 1, (n, 4)).astype(np.float32)
    sh = np.zeros((n, 1, 3), np.float32)
    sh[:, 0] = rgb_to_sh_dc(rng.uniform(0, 1, (n, 3)))
    opac = np.full(n, 1.5, np.float32)
    params = tuple(map(jnp.asarray, (means, log_scales, quats, sh, opac)))

    cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9, model=model)
    cfg = RenderConfig(img_size=(48, 48), sh_degree=0, isect_cap=1 << 12,
                       max_per_tile=128, model=model)
    ci = camera_inputs(cam, (48, 48))

    def loss(ps):
        img, aux = render(*ps, ci, jnp.zeros(3), cfg)
        return jnp.mean(img[..., :3] ** 2), aux

    (val, aux), grads = jax.value_and_grad(loss, has_aux=True)(params)
    assert np.isfinite(float(val))
    assert int(aux.num_visible) > 0, "model culled everything"
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_distortion_changes_image(rng):
    """RT8 distortion must actually bend the projection vs pinhole."""
    n = 32
    means = rng.uniform(-1.5, 1.5, (n, 3)).astype(np.float32)
    params = (
        jnp.asarray(means),
        jnp.full((n, 3), np.log(0.1)),
        jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        jnp.asarray(rgb_to_sh_dc(rng.uniform(0, 1, (n, 1, 3))), jnp.float32),
        jnp.full((n,), 2.0),
    )
    imgs = {}
    for model in [Pinhole(), RadialTangential8(k1=0.3)]:
        cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                     rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                     fov_x=0.9, fov_y=0.9, model=model)
        cfg = RenderConfig(img_size=(48, 48), sh_degree=0, isect_cap=1 << 12,
                           max_per_tile=128, model=model)
        img, _ = render(*params, camera_inputs(cam, (48, 48)),
                        jnp.zeros(3), cfg)
        imgs[type(model).__name__] = np.asarray(img)
    diff = np.abs(imgs["Pinhole"] - imgs["RadialTangential8"]).max()
    assert diff > 0.01
