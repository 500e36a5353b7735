"""Splat parameter container.

Counterpart of the reference's `Splats` module
(brush-render/src/gaussian_splats.rs:62-362), restructured as a JAX pytree:

* Parameters are separate arrays (means/log_scales/quats/sh/raw_opacities)
  rather than the reference's packed [N,10] `transforms` — the packing
  existed to minimize GPU bind slots (gaussian_splats.rs:57-74), which has
  no XLA equivalent; per-column LR scaling stays trivial on separate arrays.
* Arrays are padded to a static capacity; dead slots carry raw_opacity
  -inf-like values (sigmoid -> 0 < 1/255) so the projection culling gate
  removes them with zero special-casing. `n_alive` tracks the live prefix
  count for host-side logic (export, refine budgeting).
* The Mip-Splatting 3D filter floor `min_scale` is carried alongside and
  folded as s <- sqrt(s^2 + f^2) with opacity energy compensation at render
  time (gaussian_splats.rs:86-111 `fold_min_scale`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from brush_tpu.ops.sh import num_sh_coeffs, sh_degree_from_coeffs

DEAD_RAW_OPACITY = -20.0  # sigmoid ~ 2e-9 << 1/255 -> culled everywhere


@struct.dataclass
class Splats:
    means: jnp.ndarray          # [cap, 3]
    log_scales: jnp.ndarray     # [cap, 3]
    quats: jnp.ndarray          # [cap, 4] wxyz
    sh_coeffs: jnp.ndarray      # [cap, K, 3]
    raw_opacities: jnp.ndarray  # [cap]
    # Non-trained state:
    n_alive: jnp.ndarray = struct.field(default=None)      # [] int32
    min_scale: jnp.ndarray | None = struct.field(default=None)  # [cap] or None

    @property
    def capacity(self) -> int:
        return self.means.shape[0]

    @property
    def sh_degree(self) -> int:
        return sh_degree_from_coeffs(self.sh_coeffs.shape[1])

    def params(self) -> dict:
        """The five trained arrays as a pytree (optimizer target)."""
        return dict(
            means=self.means,
            log_scales=self.log_scales,
            quats=self.quats,
            sh_coeffs=self.sh_coeffs,
            raw_opacities=self.raw_opacities,
        )

    def with_params(self, p: dict) -> "Splats":
        return self.replace(
            means=p["means"], log_scales=p["log_scales"], quats=p["quats"],
            sh_coeffs=p["sh_coeffs"], raw_opacities=p["raw_opacities"])

    def alive_mask(self) -> jnp.ndarray:
        return jnp.arange(self.capacity) < self.n_alive

    def opacities(self) -> jnp.ndarray:
        """Rendered opacity incl. the mip filter compensation
        (gaussian_splats.rs opacities())."""
        folded = self.fold_min_scale()
        return jax.nn.sigmoid(folded.raw_opacities)

    def scales(self) -> jnp.ndarray:
        return jnp.exp(self.fold_min_scale().log_scales)

    def fold_min_scale(self) -> "Splats":
        """Fold the frozen 3D filter floor: s <- sqrt(s^2 + f^2), with opacity
        energy compensation sqrt(det_old / det_new) in raw-opacity space
        (gaussian_splats.rs:86-111)."""
        if self.min_scale is None:
            return self
        s2 = jnp.exp(2.0 * self.log_scales)
        f2 = (self.min_scale ** 2)[:, None]
        new_s2 = s2 + f2
        new_log_scales = 0.5 * jnp.log(new_s2)
        # det ratio of the 3x3 diagonal scale matrices (squared scales).
        comp = jnp.sqrt(jnp.prod(s2, axis=-1) / jnp.prod(new_s2, axis=-1))
        # sigmoid(raw') = sigmoid(raw) * comp  =>  raw' = logit(sig*comp)
        sig = jax.nn.sigmoid(self.raw_opacities) * comp
        sig = jnp.clip(sig, 1e-12, 1.0 - 1e-7)
        new_raw = jnp.log(sig) - jnp.log1p(-sig)
        return self.replace(log_scales=new_log_scales, raw_opacities=new_raw,
                            min_scale=None)

    def with_sh_degree(self, degree: int) -> "Splats":
        """Pad or truncate SH bands (gaussian_splats.rs with_sh_degree)."""
        k = num_sh_coeffs(degree)
        cur = self.sh_coeffs.shape[1]
        if k == cur:
            return self
        if k < cur:
            return self.replace(sh_coeffs=self.sh_coeffs[:, :k])
        pad = jnp.zeros((self.capacity, k - cur, 3), self.sh_coeffs.dtype)
        return self.replace(sh_coeffs=jnp.concatenate([self.sh_coeffs, pad], axis=1))


def from_raw(
    means: np.ndarray,
    log_scales: np.ndarray,
    quats: np.ndarray,
    sh_coeffs: np.ndarray,
    raw_opacities: np.ndarray,
    capacity: int | None = None,
) -> Splats:
    """Build a padded Splats from host arrays (gaussian_splats.rs from_raw)."""
    n = means.shape[0]
    cap = capacity or n
    if cap < n:
        raise ValueError(f"capacity {cap} < n {n}")

    def pad(x, fill=0.0):
        out = np.full((cap,) + x.shape[1:], fill, np.float32)
        out[:n] = x
        return jnp.asarray(out)

    quats_p = np.zeros((cap, 4), np.float32)
    quats_p[:, 0] = 1.0
    quats_p[:n] = quats
    return Splats(
        means=pad(means),
        log_scales=pad(log_scales),
        quats=jnp.asarray(quats_p),
        sh_coeffs=pad(sh_coeffs),
        raw_opacities=pad(raw_opacities, fill=DEAD_RAW_OPACITY),
        n_alive=jnp.asarray(n, jnp.int32),
    )


def grow_capacity(s: Splats, new_cap: int) -> Splats:
    """Geometric capacity growth at refine time — the only shape change (and
    hence recompile) in a training run (SURVEY.md §7 design stance)."""
    if new_cap <= s.capacity:
        return s
    extra = new_cap - s.capacity

    def pad(x, fill):
        p = jnp.full((extra,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, p], axis=0)

    quat_fill = jnp.zeros((extra, 4), s.quats.dtype).at[:, 0].set(1.0)
    return s.replace(
        means=pad(s.means, 0.0),
        log_scales=pad(s.log_scales, 0.0),
        quats=jnp.concatenate([s.quats, quat_fill], axis=0),
        sh_coeffs=pad(s.sh_coeffs, 0.0),
        raw_opacities=pad(s.raw_opacities, DEAD_RAW_OPACITY),
        min_scale=None if s.min_scale is None else pad(s.min_scale, 0.0),
    )
