"""Spherical-harmonics color evaluation, degrees 0-4.

Basis and constants follow Sloan, "Efficient Spherical Harmonic Evaluation"
(JCGT 2013) — the same recurrence the reference uses
(brush-render/src/kernels/sh.rs). Vectorized over splats; `degree` is a
Python-static argument, so unused bands trace away exactly like the
reference's comptime specialization. Gradients w.r.t. both coefficients and
viewdir come from JAX autodiff (replacing the two hand-written VJP kernels,
sh.rs `sh_coeffs_to_color_vjp` / `sh_color_viewdir_vjp`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brush_tpu.constants import SH_C0


def num_sh_coeffs(degree: int) -> int:
    return (degree + 1) * (degree + 1)


def sh_degree_from_coeffs(n_coeffs: int) -> int:
    d = int(round(n_coeffs ** 0.5)) - 1
    if num_sh_coeffs(d) != n_coeffs:
        raise ValueError(f"{n_coeffs} is not a square SH coefficient count")
    return d


def sh_basis(viewdir: jnp.ndarray, degree: int) -> jnp.ndarray:
    """[..., 3] unit viewdirs -> [..., num_sh_coeffs(degree)] basis values."""
    x, y, z = viewdir[..., 0], viewdir[..., 1], viewdir[..., 2]
    one = jnp.ones_like(x)
    out = [SH_C0 * one]

    if degree >= 1:
        f0a = 0.4886025
        out += [-f0a * y, f0a * z, -f0a * x]

    if degree >= 2:
        z2 = z * z
        f0b = -1.0925485 * z
        f1a = 0.54627424
        fc1 = x * x - y * y
        fs1 = 2.0 * x * y
        out += [
            f1a * fs1,
            f0b * y,
            0.9461747 * z2 - 0.31539157,
            f0b * x,
            f1a * fc1,
        ]

    if degree >= 3:
        f0c = -2.285229 * z2 + 0.4570458
        f1b = 1.4453057 * z
        f2a = -0.5900436
        fc2 = x * fc1 - y * fs1
        fs2 = x * fs1 + y * fc1
        out += [
            f2a * fs2,
            f1b * fs1,
            f0c * y,
            z * (1.8658817 * z2 - 1.119529),
            f0c * x,
            f1b * fc1,
            f2a * fc2,
        ]

    if degree >= 4:
        p_sh6 = 0.9461747 * z2 - 0.31539157
        p_sh12 = z * (1.8658817 * z2 - 1.119529)
        f0d = z * (-4.683326 * z2 + 2.0071396)
        f1c = 3.3116114 * z2 - 0.47308735
        f2b = -1.7701308 * z
        f3a = 0.62583575
        fc3 = x * fc2 - y * fs2
        fs3 = x * fs2 + y * fc2
        out += [
            f3a * fs3,
            f2b * fs2,
            f1c * fs1,
            f0d * y,
            1.9843135 * z * p_sh12 - 1.0062306 * p_sh6,
            f0d * x,
            f1c * fc1,
            f2b * fc2,
            f3a * fc3,
        ]

    return jnp.stack(out, axis=-1)


def sh_to_color(coeffs: jnp.ndarray, viewdir: jnp.ndarray, degree: int) -> jnp.ndarray:
    """Evaluate SH color. `coeffs` [..., K, 3] with K >= num_sh_coeffs(degree),
    `viewdir` [..., 3] unit vectors. Returns [..., 3] WITHOUT the +0.5
    color offset (mirrors kernels/sh.rs `sh_coeffs_to_color`)."""
    k = num_sh_coeffs(degree)
    basis = sh_basis(viewdir, degree)  # [..., k]
    return jnp.einsum("...k,...kc->...c", basis, coeffs[..., :k, :],
                      precision=jax.lax.Precision.HIGHEST)


def rgb_to_sh_dc(rgb: jnp.ndarray) -> jnp.ndarray:
    """Inverse of the DC band mapping: color = SH_C0 * dc + 0.5
    (brush-render/src/sh.rs:21-31)."""
    return (rgb - 0.5) / SH_C0


def sh_dc_to_rgb(dc: jnp.ndarray) -> jnp.ndarray:
    return dc * SH_C0 + 0.5
