"""Multi-chip data parallelism over camera views.

The reference is strictly single-device (SURVEY.md §2.5); the natural
multi-chip axis for 3DGS is the *view batch*: splats (and optimizer state)
replicated on every chip, each chip renders + backprops its own views, and
the parameter gradients are summed across chips before the (replicated)
optimizer update. With jax.sharding this is purely declarative — the batched
loss is a mean over views, the batch arrays are sharded over the 'dp' mesh
axis, and XLA inserts the psum over ICI (SURVEY.md §5.8).

Usage:
    mesh = view_mesh()                       # 1-D 'dp' mesh over all devices
    step = make_dp_train_step(mesh, tcfg, rcfg)
    state, stats, aux = step(state, batch)   # batch leaves have leading [B]
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from brush_tpu.ops.projection import CameraInputs
from brush_tpu.render import RenderConfig
from brush_tpu.train.config import TrainConfig
from brush_tpu.train.trainer import (
    SceneBatch,
    TrainState,
    TrainStepStats,
    train_step_impl,
)


def view_mesh(devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices).reshape(-1), axis_names=("dp",))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading view axis sharded over 'dp'; everything inside a view local."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def stack_batches(batches: list[SceneBatch]) -> SceneBatch:
    """Host helper: list of per-view batches -> one [B, ...] SceneBatch."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs, axis=0), *batches)


def make_dp_train_step(mesh: Mesh, tcfg: TrainConfig, rcfg: RenderConfig,
                       has_alpha: bool = False, alpha_is_mask: bool = False,
                       donate: bool = True, lpips_model=None):
    """jit a batched train step with dp shardings over the given mesh.

    The returned function takes (TrainState, SceneBatch-with-leading-[B]) and
    returns (TrainState, TrainStepStats, aux). B must be a multiple of the
    'dp' axis size. State lives replicated; gradients cross ICI via the psum
    XLA inserts for the mean-over-views loss.
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh)

    def step(state: TrainState, batch: SceneBatch):
        return train_step_impl(state, batch, tcfg, rcfg,
                               has_alpha=has_alpha, alpha_is_mask=alpha_is_mask,
                               batched=True, lpips_model=lpips_model)

    return jax.jit(
        step,
        in_shardings=(rep, SceneBatch(gt_packed=bsh, cam=CameraInputs(
            viewmat=bsh, pinhole=bsh, clamp_limits=bsh, cam_pos=bsh,
            half_max_render_fov=bsh))),
        out_shardings=(rep, rep, rep),
        donate_argnums=(0,) if donate else (),
    )
