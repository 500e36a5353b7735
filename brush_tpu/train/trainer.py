"""Training step: render -> fused loss -> backward -> AdamScaled -> noise.

Functional counterpart of SplatTrainer::step (brush-train/src/train.rs:157-412),
as one jit-compiled pure function over an explicit TrainState pytree:

* the reference's three optimizer sub-steps (packed transforms with
  per-column LR, SH with DC/rest scaling + reduced moment2, opacity) become
  five `adam_step` calls — elementwise-identical because Adam state is
  per-element and the packed [N,10] layout existed only to minimize GPU
  bindings;
* the refine-weight gradient, visibility mask and max-radius statistics
  accumulate into RefineRecord (brush-train/src/stats.rs:7-63);
* the opacity-gated mean noise injection (train.rs:367-399) uses the
  train-state RNG key — explicit, reproducible, checkpointable.

Static config (image size, sh degree, capacities) comes from RenderConfig;
everything else is dynamic so one compiled step serves the whole run.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from brush_tpu.models.splats import Splats
from brush_tpu.ops.loss import ImageLossConfig
from brush_tpu.ops.projection import CameraInputs
from brush_tpu.ops.sh import num_sh_coeffs
from brush_tpu.render import RenderConfig, RenderAux, render_with_refine
from brush_tpu.train.adam_scaled import AdamParamState, adam_step, init_state
from brush_tpu.train.config import TrainConfig


@struct.dataclass
class RefineRecord:
    """Per-splat accumulators between refines (stats.rs:7-63)."""

    refine_weight: jnp.ndarray   # [cap] max of per-step refine weights
    visible_count: jnp.ndarray   # [cap] sum of visibility
    max_radius: jnp.ndarray      # [cap] max screen-fraction radius

    @classmethod
    def zeros(cls, cap: int) -> "RefineRecord":
        # Three distinct buffers — sharing one would alias and break
        # donation (double-donate) under jit(donate_argnums=0).
        return cls(refine_weight=jnp.zeros((cap,), jnp.float32),
                   visible_count=jnp.zeros((cap,), jnp.float32),
                   max_radius=jnp.zeros((cap,), jnp.float32))

    def gather_stats(self, refine_weight, visible, max_radius) -> "RefineRecord":
        return RefineRecord(
            refine_weight=jnp.maximum(self.refine_weight, refine_weight),
            visible_count=self.visible_count + visible,
            max_radius=jnp.maximum(self.max_radius, max_radius),
        )


@struct.dataclass
class TrainState:
    splats: Splats
    opt: dict[str, AdamParamState]
    refine: RefineRecord
    step: jnp.ndarray            # [] int32
    rng: jnp.ndarray             # PRNG key
    median_scale: jnp.ndarray    # [] f32, bounds.median_size() (train.rs:185)
    bounds_center: jnp.ndarray = None   # [3] percentile-0.8 scene bounds
    bounds_extent: jnp.ndarray = None   # [3]


class SceneBatch(NamedTuple):
    """One training view (brush-dataset/src/scene.rs SceneBatch). Alpha-mode
    flags are trace-static and passed to train_step directly."""

    gt_packed: jnp.ndarray       # [H, W] uint32 RGBA
    cam: CameraInputs


class TrainStepStats(NamedTuple):
    loss: jnp.ndarray
    num_visible: jnp.ndarray
    lr_mean: jnp.ndarray
    # [] bool: intersection/chunk capacity overflowed this step. The step is
    # then a device-side NO-OP (params/moments/refine kept) so a truncated
    # gradient can never be applied — the host grows caps and recompiles
    # (the reference instead sizes buffers exactly every step with a GPU->CPU
    # readback, render.rs:146-167).
    overflowed: jnp.ndarray = None


def init_train_state(splats: Splats, rng: jnp.ndarray,
                     median_scale: float | jnp.ndarray | None = None,
                     ) -> TrainState:
    """Build a fresh train state. Bounds (and hence the median scale that
    multiplies the mean LR, train.rs:185) come from the live splat means at
    percentile 0.8 unless `median_scale` overrides them."""
    from brush_tpu.train import refine as refine_mod

    opt = {
        "means": init_state(splats.means),
        "quats": init_state(splats.quats),
        "log_scales": init_state(splats.log_scales),
        "sh_coeffs": init_state(splats.sh_coeffs, reduce_moment_2=True),
        "raw_opacities": init_state(splats.raw_opacities),
    }
    alive = jnp.arange(splats.capacity) < splats.n_alive
    center, extent = refine_mod._percentile_bounds(
        splats.means, alive, 0.8)
    med = (jnp.asarray(median_scale, jnp.float32)
           if median_scale is not None else refine_mod.median_size(extent))
    return TrainState(
        splats=splats,
        opt=opt,
        refine=RefineRecord.zeros(splats.capacity),
        step=jnp.zeros((), jnp.int32),
        rng=rng,
        median_scale=med,
        bounds_center=center,
        bounds_extent=extent,
    )


def _sh_lr_scaling(n_coeffs: int, rest_scale: float) -> jnp.ndarray:
    """DC full LR; higher bands lr/rest_scale (train.rs:380-391)."""
    s = jnp.full((1, n_coeffs, 1), 1.0 / rest_scale, jnp.float32)
    return s.at[:, 0].set(1.0)


def train_step(
    state: TrainState,
    batch: SceneBatch,
    tcfg: TrainConfig,
    rcfg: RenderConfig,
    has_alpha: bool = False,
    alpha_is_mask: bool = False,
    lpips_model=None,
) -> tuple[TrainState, TrainStepStats, RenderAux]:
    """One fully-jitted single-view training step (reference semantics)."""
    return train_step_impl(state, batch, tcfg, rcfg,
                           has_alpha=has_alpha, alpha_is_mask=alpha_is_mask,
                           batched=False, lpips_model=lpips_model)


def train_step_impl(
    state: TrainState,
    batch: SceneBatch,
    tcfg: TrainConfig,
    rcfg: RenderConfig,
    has_alpha: bool = False,
    alpha_is_mask: bool = False,
    batched: bool = False,
    lpips_model=None,
) -> tuple[TrainState, TrainStepStats, RenderAux]:
    """One training step. `tcfg`/`rcfg` and the alpha-mode flags are
    trace-static (one compile per combination, like the reference's comptime
    loss kernel flags). With `batched=True`, batch leaves carry a leading
    view axis [B]; the loss is the mean over views, which under a 'dp'
    sharding becomes a cross-chip gradient psum (parallel/data_parallel.py).
    """
    rng, k_bg, k_noise = jax.random.split(state.rng, 3)

    # Background: base + uniform noise, clamped (config background_noise);
    # sampled per view in batched mode.
    n_views = batch.gt_packed.shape[0] if batched else 1
    base_bg = jnp.asarray(tcfg.background_color, jnp.float32)
    bgs = jnp.clip(
        base_bg + jax.random.uniform(
            k_bg, (n_views, 3), minval=-tcfg.background_noise_strength,
            maxval=tcfg.background_noise_strength),
        0.0, 1.0)

    splats = state.splats
    params = splats.params()
    refine_holder = jnp.zeros((splats.capacity,), jnp.float32)
    visible_holder = jnp.zeros((splats.capacity,), jnp.float32)

    ssim_enabled = tcfg.ssim_weight > 0.0
    l1_w, ssim_w = ((1.0 - tcfg.ssim_weight, -tcfg.ssim_weight)
                    if ssim_enabled else (1.0, 0.0))
    do_alpha_match = (has_alpha and not alpha_is_mask
                      and tcfg.match_alpha_weight > 0.0)
    composite = has_alpha  # bg noise makes bg != 0 almost surely

    def view_loss(params, refine_holder, visible_holder, gt_packed, cam, bg):
        rendered = splats.with_params(params).fold_min_scale()
        img, aux = render_with_refine(
            rendered.means, rendered.log_scales, rendered.quats,
            rendered.sh_coeffs, rendered.raw_opacities,
            cam, bg, rcfg, refine_holder, visible_holder)
        pred = img if do_alpha_match else img[..., :3]
        # Compositing folds gt + (1-a)*bg inside the loss (train.rs:215-218);
        # bg is traced, so it goes through image_loss's bg_dyn argument
        # (single SSIM implementation, ops/loss.py).
        lcfg = ImageLossConfig(
            l1_weight=l1_w, ssim_weight=ssim_w, composite_bg=None,
            mask=alpha_is_mask, alpha_match=do_alpha_match)
        from brush_tpu.ops.loss import image_loss
        loss = image_loss(pred, gt_packed, lcfg, tcfg.match_alpha_weight,
                          bg_dyn=bg if composite else None)
        if lpips_model is not None and tcfg.lpips_loss_weight > 0.0:
            # Optional perceptual term (train.rs:246-253; weight 0 default).
            from brush_tpu.ops.loss import unpack_gt_rgb
            gt_rgb = unpack_gt_rgb(gt_packed, bg if composite else None)
            loss = loss + tcfg.lpips_loss_weight * lpips_model(
                img[None, ..., :3], gt_rgb[None])
        return loss, aux

    def loss_fn(params, refine_holder, visible_holder):
        if batched:
            losses, auxs = jax.vmap(
                view_loss, in_axes=(None, None, None, 0, 0, 0))(
                    params, refine_holder, visible_holder,
                    batch.gt_packed, batch.cam, bgs)
            aux = RenderAux(
                num_visible=jnp.max(auxs.num_visible),
                num_isects=jnp.max(auxs.num_isects),
                num_bbox_tail=jnp.max(auxs.num_bbox_tail),
                max_isects_per_tile=jnp.max(auxs.max_isects_per_tile),
                visible=jnp.max(auxs.visible, axis=0),
                max_radius=jnp.max(auxs.max_radius, axis=0),
                num_chunks=(jnp.max(auxs.num_chunks)
                            if auxs.num_chunks is not None else None),
            )
            return jnp.mean(losses), aux
        loss, aux = view_loss(params, refine_holder, visible_holder,
                              batch.gt_packed, batch.cam, bgs[0])
        return loss, aux

    (loss, aux), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True)(
            params, refine_holder, visible_holder)
    param_grads, refine_weight, visible_grad = grads
    # Holder cotangents: the batched loss is a *mean* over views, so undo the
    # 1/B factor to recover per-step accumulations matching the reference's
    # one-view-per-step semantics; visibility is a 0/1 mask.
    n_views_f = jnp.asarray(float(n_views), jnp.float32)
    refine_weight = refine_weight * n_views_f
    visible = jnp.clip(visible_grad * n_views_f, 0.0, 1.0)

    # --- Learning rates (train.rs:311-364) ---
    decay = tcfg.mean_lr_decay()
    lr_mean = (tcfg.lr_mean * decay ** state.step.astype(jnp.float32)
               ) * state.median_scale

    opt = dict(state.opt)
    new_params = {}
    lrs = {
        "means": lr_mean,
        "quats": tcfg.lr_rotation,
        "log_scales": tcfg.lr_scale,
        "raw_opacities": tcfg.lr_opac,
        "sh_coeffs": tcfg.lr_coeffs_dc,
    }
    sh_scaling = _sh_lr_scaling(num_sh_coeffs(splats.sh_degree),
                                tcfg.lr_coeffs_sh_scale)
    for name in params:
        scaling = sh_scaling if name == "sh_coeffs" else None
        new_params[name], opt[name] = adam_step(
            params[name], param_grads[name], opt[name], lrs[name], scaling)

    new_splats = splats.with_params(new_params)

    # --- Opacity-gated mean noise injection (train.rs:367-399) ---
    folded = new_splats.fold_min_scale()
    inv_opac = 1.0 - jax.nn.sigmoid(folded.raw_opacities)
    noise_weight = jnp.clip(inv_opac ** 150.0, 0.0, 1.0) * visible
    samples = jax.random.normal(k_noise, new_splats.means.shape)
    noise = samples * (noise_weight * lr_mean * tcfg.mean_noise_weight)[:, None]
    noise = jnp.clip(noise, -state.median_scale, state.median_scale)
    new_splats = new_splats.replace(means=new_splats.means + noise)

    refine = state.refine.gather_stats(refine_weight, visible, aux.max_radius)

    # Capacity-overflow no-op gate: an overflowing step truncates slots (the
    # binning masks them to the sentinel, ops/tiling.py), losing their
    # gradients — never apply such an update. step/rng still advance so the
    # run keeps moving while the host grows capacities.
    overflowed = aux.num_isects > rcfg.isect_cap
    if aux.num_chunks is not None:
        overflowed = overflowed | (
            aux.num_chunks > rcfg.resolved_chunk_cap(splats.capacity))

    def _gate(new, old):
        return jax.tree.map(lambda a, b: jnp.where(overflowed, b, a), new, old)

    new_state = state.replace(
        splats=_gate(new_splats, state.splats),
        opt=_gate(opt, state.opt),
        refine=_gate(refine, state.refine),
        step=state.step + 1, rng=rng)
    stats = TrainStepStats(loss=loss, num_visible=aux.num_visible,
                           lr_mean=lr_mean, overflowed=overflowed)
    return new_state, stats, aux


