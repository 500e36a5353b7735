"""Space-parallel rendering: image strips sharded over an 8-device mesh
must reproduce the single-device render (parallel/tile_parallel.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from brush_tpu.camera import Camera
from brush_tpu.ops.sh import rgb_to_sh_dc
from brush_tpu.render import RenderConfig, camera_inputs, render
from brush_tpu.train.splat_init import create_random_splats
from brush_tpu.parallel.tile_parallel import (
    render_space_parallel, space_mesh, strip_camera_inputs)


@pytest.fixture
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return space_mesh(jax.devices()[:8])


def test_matches_single_device(mesh, rng):
    cam = Camera(position=np.array([0.0, 0.0, -5.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.7)
    splats = create_random_splats(192, [cam], rng, scene_scale_override=6.0,
                                  sh_degree=1)
    img_size = (96, 80)  # 6x5 tiles -> uneven 5-row split over 8 strips
    rcfg = RenderConfig(img_size=img_size, sh_degree=1, isect_cap=1 << 13,
                        max_per_tile=256)
    bg = jnp.array([0.1, 0.2, 0.3], jnp.float32)

    ref, aux = render(splats.means, splats.log_scales, splats.quats,
                      splats.sh_coeffs, splats.raw_opacities,
                      camera_inputs(cam, img_size), bg, rcfg)
    assert int(aux.num_isects) <= rcfg.isect_cap, "oracle overflowed"
    got = render_space_parallel(splats, cam, bg, rcfg, mesh)

    assert got.shape == (80, 96, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-6, rtol=1e-5)


def test_strip_inputs_shapes():
    cam = Camera(position=np.array([0.0, 0.0, -5.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9)
    from brush_tpu.constants import TILE_WIDTH
    img_dim = 4 * TILE_WIDTH  # one tile row per strip
    stack, h_strip = strip_camera_inputs(cam, (img_dim, img_dim), 4)
    assert h_strip == TILE_WIDTH
    assert stack.pinhole.shape == (4, 4)
    # cy walks down by one strip height per strip.
    cys = np.asarray(stack.pinhole)[:, 3]
    np.testing.assert_allclose(np.diff(cys), -h_strip)
