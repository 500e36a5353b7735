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
) -> jnp.ndarray:
    """Per-splat PUP score: log|det(H + eps I)| with
    H = sum_views J J^T over [d_mean, d_log_scale] (lod.rs:44-112).
    J J^T is estimated with `n_probes` random image-space probes per view
    (E[J^T v v^T J] = J^T J for unit-variance v)."""
    folded = splats.fold_min_scale()
    cap = splats.capacity
    bg = jnp.zeros(3, jnp.float32)

    def render_img(means, log_scales, cam):
        img, _ = render(means, log_scales, folded.quats, folded.sh_coeffs,
                        folded.raw_opacities, cam, bg, rcfg)
        return img[..., :3]

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
        h_acc = h_acc + view_hessian(cam, kv)

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
