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


def save_checkpoint(path: str | Path, state: TrainState,
                    iteration: int | None = None) -> None:
    path = Path(path).absolute()
    ckpt = ocp.StandardCheckpointer()
    ckpt.save(path / "state", state, force=True)
    ckpt.wait_until_finished()
    if iteration is not None:
        import json
        meta = dict(iteration=int(iteration),
                    capacity=int(state.splats.capacity),
                    sh_degree=int(state.splats.sh_degree))
        (path / "meta.json").write_text(json.dumps(meta))


def checkpoint_meta(path: str | Path) -> dict:
    import json
    return json.loads((Path(path).absolute() / "meta.json").read_text())


def load_checkpoint(path: str | Path, template: TrainState) -> TrainState:
    """Restore into the structure of `template` (same capacity/sh degree).

    Use checkpoint_meta() to learn the capacity/sh_degree needed to build
    a matching template before calling this."""
    path = Path(path).absolute()
    sub = path / "state"
    if not sub.exists():  # older flat layout
        sub = path
    ckpt = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    return ckpt.restore(sub, abstract)
