"""LOD baking: PUP importance scores + decimation.

Counterpart of brush-train/src/lod.rs: after main training, each LOD level
keeps the top `lod_decimation_keep`% of splats by PUP score — the
log-determinant of the per-splat 6x6 sensitivity Hessian sum(J J^T) of
[d_mean(3), d_log_scale(3)] over all training views (compute_pup_scores:78,
log_det_6x6:44) — then fine-tunes on downscaled images and exports
`_lodN.ply` (driver: train_stream.rs:220-291).

TPU-native: the per-view Jacobian products come from reverse-mode autodiff
of the rendered image against means/log_scales, accumulated as 6x6 outer
products per splat — one vjp per view with random probe cotangents
approximating sum(J J^T) (Hutchinson estimator with K probes), fully jitted.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from brush_tpu.models.splats import Splats
from brush_tpu.render import RenderConfig, render


def pup_scores(
    splats: Splats,
    cams: list,                  # list of CameraInputs
    rcfg: RenderConfig,
    rng: jnp.ndarray,
    n_probes: int = 8,
    exact: bool = False,
) -> jnp.ndarray:
    """Per-splat PUP score: log|det(H + eps I)| with
    H = sum_views J J^T over [d_mean, d_log_scale] (lod.rs:44-112).

    Default mode estimates J J^T with `n_probes` random image-space probes
    per view (E[J^T v v^T J] = J^T J for unit-variance v). ``exact=True``
    accumulates the per-pixel Jacobian outer products exactly like the
    reference (lod.rs:78), building J column-by-column with central finite
    differences of the FORWARD render — an independent differentiation
    path (2 x 6 x capacity renders per view: tiny scenes only), used as
    the oracle the estimator is tested against (tests/test_lod.py)."""
    folded = splats.fold_min_scale()
    cap = splats.capacity
    bg = jnp.zeros(3, jnp.float32)

    def render_img(means, log_scales, cam):
        img, _ = render(means, log_scales, folded.quats, folded.sh_coeffs,
                        folded.raw_opacities, cam, bg, rcfg)
        return img[..., :3]

    fd_eps = 1e-3

    @jax.jit
    def fd_col(cam, dm, ds):
        """One Jacobian column by central differences: dm/ds carry +-eps
        in exactly one (splat, param) entry. One forward graph, reused for
        all 6*cap columns — per-pixel reverse passes (jacrev / chunked
        one-hot vjps) compile pathologically at any size."""
        up = render_img(folded.means + dm, folded.log_scales + ds, cam)
        dn = render_img(folded.means - dm, folded.log_scales - ds, cam)
        return (up - dn).reshape(-1) / (2.0 * fd_eps)

    def view_hessian_exact(cam):
        import numpy as _np
        cols = []
        zm = _np.zeros((cap, 3), _np.float32)
        for g in range(cap):
            for which, i in [("m", 0), ("m", 1), ("m", 2),
                             ("s", 0), ("s", 1), ("s", 2)]:
                dm, ds = zm.copy(), zm.copy()
                (dm if which == "m" else ds)[g, i] = fd_eps
                cols.append(fd_col(cam, jnp.asarray(dm), jnp.asarray(ds)))
        j = jnp.stack(cols, axis=1).reshape(-1, cap, 6)    # [P, cap, 6]
        return jnp.einsum("pgi,pgj->gij", j, j)

    @jax.jit
    def view_hessian(cam, key):
        _, vjp_fn = jax.vjp(
            lambda m, ls: render_img(m, ls, cam),
            folded.means, folded.log_scales)

        def body(k, acc):
            probe = jax.random.normal(
                jax.random.fold_in(key, k), rcfg.img_size[::-1] + (3,),
                jnp.float32)
            gm, gs = vjp_fn(probe)
            j = jnp.concatenate([gm, gs], axis=1)          # [cap, 6]
            return acc + j[:, :, None] * j[:, None, :] / n_probes

        return jax.lax.fori_loop(
            0, n_probes, body, jnp.zeros((cap, 6, 6), jnp.float32))

    h_acc = jnp.zeros((cap, 6, 6), jnp.float32)
    for i, cam in enumerate(cams):
        rng, kv = jax.random.split(rng)
        h_acc = h_acc + (view_hessian_exact(cam) if exact
                         else view_hessian(cam, kv))

    eps = 1e-12
    h = h_acc + eps * jnp.eye(6)
    sign, logdet = jnp.linalg.slogdet(h)
    return jnp.where(jnp.isfinite(logdet), logdet, -jnp.inf)


def decimate_to_count(splats: Splats, scores: jnp.ndarray,
                      keep_count: int) -> Splats:
    """Keep the `keep_count` highest-scoring live splats (lod.rs:13-42),
    compacting them to the front; the rest become dead slots."""
    cap = splats.capacity
    alive = jnp.arange(cap) < splats.n_alive
    key = jnp.where(alive, scores, -jnp.inf)
    order = jnp.argsort(-key)                 # best first
    keep_mask_sorted = jnp.arange(cap) < jnp.minimum(keep_count,
                                                     splats.n_alive)

    def take(x):
        return x[order]

    from brush_tpu.models.splats import DEAD_RAW_OPACITY
    new = splats.replace(
        means=take(splats.means),
        log_scales=take(splats.log_scales),
        quats=take(splats.quats),
        sh_coeffs=take(splats.sh_coeffs),
        raw_opacities=jnp.where(keep_mask_sorted,
                                take(splats.raw_opacities),
                                DEAD_RAW_OPACITY),
        min_scale=(None if splats.min_scale is None
                   else take(splats.min_scale)),
        n_alive=jnp.minimum(keep_count, splats.n_alive).astype(jnp.int32),
    )
    return new
