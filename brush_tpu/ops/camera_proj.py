"""Device-side lens projection for all four camera models.

Formula parity with the reference kernels
(brush-render/src/kernels/camera_model/{pinhole,kannala_brandt_4,
radial_tangential_8,thin_prism_fisheye}.rs), but TPU-native in structure:

* Vectorized over splats — no per-thread kernels.
* The projection Jacobian is `jax.jacfwd` of the projection function,
  evaluated at the clamp-adjusted point `(clamp(x/z)*z, clamp(y/z)*z, z)`.
  That single rule reproduces the reference's hand-derived clamped Jacobians
  exactly: pinhole (pinhole.rs:33-56) and RT8 (radial_tangential_8.rs:66-146)
  clamp the normalized coordinate before building J; the fisheyes pass
  effectively-infinite limits (camera.rs:243-253) so the clamp is a no-op.
  ~900 LoC of hand-written Jacobian/VJP kernels become autodiff.

The model *type* is a static Python value (mirrors the reference's comptime
CameraModel); coefficients are dynamic scalars.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brush_tpu.camera import (
    CameraModel,
    KannalaBrandt4,
    Pinhole,
    RadialTangential8,
    ThinPrismFisheye,
)


def _project_pinhole(p: jnp.ndarray, ph: jnp.ndarray) -> jnp.ndarray:
    fx, fy, cx, cy = ph[0], ph[1], ph[2], ph[3]
    inv_z = 1.0 / p[..., 2]
    return jnp.stack(
        [fx * p[..., 0] * inv_z + cx, fy * p[..., 1] * inv_z + cy], axis=-1)


def _project_kb4(p: jnp.ndarray, ph: jnp.ndarray, m: KannalaBrandt4) -> jnp.ndarray:
    fx, fy, cx, cy = ph[0], ph[1], ph[2], ph[3]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    inv_z = 1.0 / z
    pin_u = fx * x * inv_z + cx
    pin_v = fy * y * inv_z + cy

    r2 = x * x + y * y
    near_axis = r2 < 1e-12  # matches r < 1e-6 (kannala_brandt_4.rs:48)
    # Guard the non-selected branch so jacfwd stays NaN-free near the axis.
    r = jnp.sqrt(jnp.where(near_axis, 1.0, r2))
    theta = jnp.arctan2(r, z)
    t2 = theta * theta
    d = theta * (1.0 + t2 * (m.k1 + t2 * (m.k2 + t2 * (m.k3 + t2 * m.k4))))
    inv_r = 1.0 / r
    fe_u = fx * (d * x * inv_r) + cx
    fe_v = fy * (d * y * inv_r) + cy
    return jnp.stack(
        [jnp.where(near_axis, pin_u, fe_u), jnp.where(near_axis, pin_v, fe_v)],
        axis=-1)


def _project_rt8(p: jnp.ndarray, ph: jnp.ndarray, m: RadialTangential8) -> jnp.ndarray:
    fx, fy, cx, cy = ph[0], ph[1], ph[2], ph[3]
    x_ = p[..., 0] / p[..., 2]
    y_ = p[..., 1] / p[..., 2]
    x2, y2 = x_ * x_, y_ * y_
    r2 = x2 + y2
    r4 = r2 * r2
    r6 = r4 * r2
    d = (1.0 + m.k1 * r2 + m.k2 * r4 + m.k3 * r6) / (
        1.0 + m.k4 * r2 + m.k5 * r4 + m.k6 * r6)
    xy = x_ * y_
    xd = x_ * d + 2.0 * m.p1 * xy + m.p2 * (r2 + 2.0 * x2)
    yd = y_ * d + 2.0 * m.p2 * xy + m.p1 * (r2 + 2.0 * y2)
    return jnp.stack([fx * xd + cx, fy * yd + cy], axis=-1)


def _project_tpf(p: jnp.ndarray, ph: jnp.ndarray, m: ThinPrismFisheye) -> jnp.ndarray:
    kb4 = KannalaBrandt4(m.k1, m.k2, m.k3, m.k4)
    uv = _project_kb4(p, ph, kb4)
    fx, fy = ph[0], ph[1]
    x, y, z = p[..., 0], p[..., 1], p[..., 2]
    inv_z2 = 1.0 / (z * z)
    x2, y2, xy = x * x, y * y, x * y
    r2 = x2 + y2
    nu = 2.0 * m.p1 * xy + m.p2 * (3.0 * x2 + y2) + m.sx1 * r2
    nv = 2.0 * m.p2 * xy + m.p1 * (x2 + 3.0 * y2) + m.sy1 * r2
    return uv + jnp.stack([fx * nu * inv_z2, fy * nv * inv_z2], axis=-1)


def project(mean_c: jnp.ndarray, pinhole: jnp.ndarray, model: CameraModel) -> jnp.ndarray:
    """Project camera-space points [..., 3] to pixel coords [..., 2].

    `pinhole` is [fx, fy, cx, cy]; `model` picks the (static) lens type.
    """
    if isinstance(model, Pinhole):
        return _project_pinhole(mean_c, pinhole)
    if isinstance(model, KannalaBrandt4):
        return _project_kb4(mean_c, pinhole, model)
    if isinstance(model, RadialTangential8):
        return _project_rt8(mean_c, pinhole, model)
    if isinstance(model, ThinPrismFisheye):
        return _project_tpf(mean_c, pinhole, model)
    raise TypeError(f"unknown camera model {model!r}")


def projection_jacobian(
    mean_c: jnp.ndarray,
    pinhole: jnp.ndarray,
    clamp_limits: jnp.ndarray,
    model: CameraModel,
) -> jnp.ndarray:
    """EWA projection Jacobian d(uv)/d(mean_c): [N, 2, 3].

    Evaluated at the clamp-adjusted point so it matches the reference's
    clamped Jacobians (see module docstring). `clamp_limits` is
    [lim_neg_x, lim_pos_x, lim_neg_y, lim_pos_y].
    """
    z = mean_c[..., 2]
    xn = jnp.clip(mean_c[..., 0] / z, clamp_limits[0], clamp_limits[1])
    yn = jnp.clip(mean_c[..., 1] / z, clamp_limits[2], clamp_limits[3])
    clamped = jnp.stack([xn * z, yn * z, z], axis=-1)

    def proj_one(pt):
        return project(pt, pinhole, model)

    return jax.vmap(jax.jacfwd(proj_one))(clamped.reshape(-1, 3)).reshape(
        mean_c.shape[:-1] + (2, 3))
