"""Adam with per-element LR scaling and optional reduced second moment.

Functional rebuild of the reference's AdamScaled optimizer
(brush-train/src/adam_scaled.rs:94-213): standard bias-corrected Adam
(beta1=0.9, beta2=0.999, eps=1e-15 — train.rs:75) with

* `scaling`: a broadcastable per-element learning-rate multiplier (the
  trainer uses per-column scales for the packed transforms and a per-SH-band
  scale for coefficients);
* `reduce_moment_2`: Adam-mini-style second moment averaged over all
  trailing dims (one scalar per splat row) — used for SH coefficients.

Implemented as explicit pytree state (not optax) because refine needs to do
surgery on the moments (prune/zero/cat rows, train.rs map_splats_and_opt:810)
— with explicit state that's a plain gather/scatter.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct

from brush_tpu.constants import ADAM_EPS


@struct.dataclass
class AdamParamState:
    moment1: jnp.ndarray
    moment2: jnp.ndarray         # full shape, or [N,1,..] when reduced
    time: jnp.ndarray            # [] int32


def init_state(param: jnp.ndarray, reduce_moment_2: bool = False) -> AdamParamState:
    m2_shape = (param.shape[0],) + (1,) * (param.ndim - 1) if reduce_moment_2 else param.shape
    return AdamParamState(
        moment1=jnp.zeros(param.shape, jnp.float32),
        moment2=jnp.zeros(m2_shape, jnp.float32),
        time=jnp.zeros((), jnp.int32),
    )


def adam_step(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    state: AdamParamState,
    lr: jnp.ndarray | float,
    scaling: Optional[jnp.ndarray] = None,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = ADAM_EPS,
) -> tuple[jnp.ndarray, AdamParamState]:
    """One AdamScaled update. `scaling` broadcasts against `param` and
    multiplies the learning rate per element (adam_scaled.rs:125-130)."""
    reduce = state.moment2.shape != param.shape
    g2 = grad * grad
    if reduce:
        g2 = jnp.mean(g2.reshape(g2.shape[0], -1), axis=1).reshape(state.moment2.shape)

    t = state.time + 1
    m1 = beta1 * state.moment1 + (1.0 - beta1) * grad
    m2 = beta2 * state.moment2 + (1.0 - beta2) * g2
    tf = t.astype(jnp.float32)
    m1_hat = m1 / (1.0 - beta1 ** tf)
    m2_hat = m2 / (1.0 - beta2 ** tf)
    update = m1_hat / (jnp.sqrt(m2_hat) + eps)
    if scaling is not None:
        update = update * (scaling * lr)
    else:
        update = update * lr
    return param - update, AdamParamState(moment1=m1, moment2=m2, time=t)
