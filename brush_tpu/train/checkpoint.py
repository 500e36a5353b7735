"""Checkpoint / resume.

The reference's checkpointing is ply export + `--start-iter` (optimizer
state is lost; SURVEY.md §5.4). Because our train state is an explicit
pytree, we checkpoint everything — params, Adam moments, refine record, RNG
key, bounds — via orbax, exactly as SURVEY.md recommends ("strictly better
than the reference"). PLY export remains for interop."""

from __future__ import annotations

from pathlib import Path

import jax
import numpy as np
import orbax.checkpoint as ocp

from brush_tpu.train.trainer import TrainState


def save_checkpoint(path: str | Path, state: TrainState) -> None:
    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path, state, force=True)
    ckpt.wait_until_finished()


def load_checkpoint(path: str | Path, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (same capacity/sh degree)."""
    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    return ckpt.restore(path, abstract)
