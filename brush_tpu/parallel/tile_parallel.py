"""Space-parallel (multi-chip) rendering: shard the image across devices.

The reference is single-device; its per-tile GPU parallelism maps onto one
TensorCore's serial grid here. For multi-chip *rendering* throughput the
natural SPMD axis is image space: each chip renders a horizontal strip of
tile rows with the splat set replicated — no communication at all until the
strips are assembled (the sharding's own all-gather, riding ICI).

A strip render is *exactly* the full render restricted to a sub-image: the
same camera with the principal point shifted by the strip's y-offset. Cull
gates then discard out-of-strip splats per chip, and per-pixel blend math
is bit-identical to the single-chip path because the EWA Jacobian clamp
limits are computed from the FULL image and passed through unchanged.

Composable with the view-parallel axis (data_parallel.py) on a 2-D mesh:
('views', 'space') — views for training throughput, space for resolution.
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from brush_tpu.camera import Camera
from brush_tpu.constants import TILE_WIDTH
from brush_tpu.ops.projection import CameraInputs
from brush_tpu.render import RenderConfig, camera_inputs, render


def space_mesh(devices) -> Mesh:
    return Mesh(np.asarray(devices), axis_names=("space",))


def strip_camera_inputs(cam: Camera, img_size, n_strips: int):
    """Per-strip CameraInputs (stacked on a leading [n_strips] axis) and
    the tile-aligned strip height. Strip i sees the sub-image rows
    [i*h, (i+1)*h) via a cy shift; clamp limits stay full-image."""
    w, h = img_size
    tile_rows = -(-h // TILE_WIDTH)
    rows_per = -(-tile_rows // n_strips)
    h_strip = rows_per * TILE_WIDTH
    full = camera_inputs(cam, img_size)

    pin = np.asarray(full.pinhole)
    pins = np.stack([
        np.array([pin[0], pin[1], pin[2], pin[3] - i * h_strip], np.float32)
        for i in range(n_strips)
    ])
    stack = CameraInputs(
        viewmat=jnp.broadcast_to(full.viewmat, (n_strips,) + full.viewmat.shape),
        pinhole=jnp.asarray(pins),
        clamp_limits=jnp.broadcast_to(
            full.clamp_limits, (n_strips,) + full.clamp_limits.shape),
        cam_pos=jnp.broadcast_to(full.cam_pos, (n_strips, 3)),
        half_max_render_fov=jnp.broadcast_to(
            jnp.asarray(full.half_max_render_fov, jnp.float32), (n_strips,)),
    )
    return stack, h_strip


def make_space_parallel_render(mesh: Mesh, rcfg: RenderConfig):
    """jitted (params..., cam_stack, bg) -> [H, W, 4] with the strip axis
    sharded over `mesh`'s 'space' axis. `rcfg.img_size` is the FULL image;
    `rcfg.isect_cap` is the per-strip capacity."""
    w, h = rcfg.img_size
    n = mesh.devices.size
    tile_rows = -(-h // TILE_WIDTH)
    h_strip = -(-tile_rows // n) * TILE_WIDTH
    rcfg_strip = dataclasses.replace(rcfg, img_size=(w, h_strip))

    def strip_render(means, log_scales, quats, sh, opac, cam_stack, bg):
        cam = jax.tree_util.tree_map(lambda x: x[0], cam_stack)
        img, _ = render(means, log_scales, quats, sh, opac, cam, bg,
                        rcfg_strip)
        return img[None]  # [1, h_strip, W, 4]

    sharded = jax.shard_map(
        strip_render, mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P("space"), P()),
        out_specs=P("space"),
        check_vma=False)

    @jax.jit
    def run(means, log_scales, quats, sh, opac, cam_stack, bg):
        strips = sharded(means, log_scales, quats, sh, opac, cam_stack, bg)
        full = strips.reshape(n * h_strip, w, 4)
        return full[:h]

    return run


def render_space_parallel(splats, cam: Camera, bg, rcfg: RenderConfig,
                          mesh: Mesh):
    """Convenience one-shot: render `splats` over every device in `mesh`."""
    n = mesh.devices.size
    cam_stack, _ = strip_camera_inputs(cam, rcfg.img_size, n)
    fn = make_space_parallel_render(mesh, rcfg)
    return fn(splats.means, splats.log_scales, splats.quats,
              splats.sh_coeffs, splats.raw_opacities, cam_stack,
              jnp.asarray(bg, jnp.float32))
