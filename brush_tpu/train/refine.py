"""Refinement: prune / resample / split under a fixed capacity, fully jitted.

Functional counterpart of SplatTrainer::refine + refine_splats
(brush-train/src/train.rs:414-807). The reference's shape-changing ops
(argwhere, select, cat) and several GPU->CPU readbacks become fixed-capacity
tensor ops (SURVEY.md §7 hard part 4):

* prune -> stable-sort compaction keeping live rows as a prefix;
* CPU multinomial sampling without replacement -> the Gumbel top-k trick
  (exact equivalent, and it stays on device);
* `cat` of split children -> scatter into the dead-slot region past
  `n_alive` (with mode="drop" so capacity overflow silently no-ops);
* optimizer-moment surgery (zero both halves of a split,
  train.rs map_splats_and_opt:810) -> masked where + scatter.

One refine step changes no array shapes, so the whole thing compiles once;
capacity growth (models/splats.py grow_capacity) is the only recompile.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from brush_tpu.constants import ALPHA_CUTOFF_MID
from brush_tpu.models.splats import DEAD_RAW_OPACITY, Splats
from brush_tpu.train.config import (
    MIN_SCALE_FACTOR,
    MIN_SCALE_FREEZE_FRAC,
    BOUND_PERCENTILE,
    TrainConfig,
)
from brush_tpu.train.trainer import RefineRecord, TrainState
from brush_tpu.utils.quat import quat_rotate_vec

FRAC_1_SQRT_2 = 0.7071067811865476


class RefineStats(NamedTuple):
    num_added: jnp.ndarray
    num_pruned: jnp.ndarray
    num_pruned_non_finite: jnp.ndarray
    total_splats: jnp.ndarray
    # Selection decomposition of num_added (the reference streams these to
    # rerun as per-refine histograms, visualize_tools.rs:86-707):
    num_oversized: jnp.ndarray   # forced screen-size splits
    num_resampled: jnp.ndarray   # opacity-weighted resample of pruned budget
    num_grad_grown: jnp.ndarray  # gradient-growth selections


def _inv_sigmoid(x):
    return jnp.log(x) - jnp.log1p(-x)


def _percentile_bounds(means, alive, percentile):
    """Per-axis index-percentile bounds over live, finite means
    (splat_init.rs bounds_from_pos:130-165), on device."""
    big = 1.0e30
    ok = alive[:, None] & jnp.isfinite(means)
    n_ok = jnp.maximum(jnp.sum(ok, axis=0), 1)  # [3]
    lo_idx = ((1.0 - percentile) / 2.0 * n_ok).astype(jnp.int32)
    hi_idx = jnp.minimum(n_ok - 1,
                         ((1.0 + percentile) / 2.0 * n_ok).astype(jnp.int32))
    asc = jnp.sort(jnp.where(ok, means, big), axis=0)  # invalid sort to end
    mins = jnp.take_along_axis(asc, lo_idx[None, :], axis=0)[0]
    maxs = jnp.take_along_axis(asc, hi_idx[None, :], axis=0)[0]
    center = (mins + maxs) / 2.0
    extent = (maxs - mins) / 2.0
    return center, extent


def median_size(extent):
    """Middle extent * 2 (bounding_box.rs:23-29)."""
    return jnp.sort(extent)[1] * 2.0


def compute_min_scale(means, view_centers, view_focals):
    """Mip-Splatting 3D-filter floor: sqrt(0.1) * min_v(dist/focal)
    (train.rs compute_min_scale:82-105)."""
    d = jnp.linalg.norm(means[:, None, :] - view_centers[None, :, :], axis=-1)
    ratio = d / jnp.maximum(view_focals[None, :], 1e-6)
    return jnp.sqrt(MIN_SCALE_FACTOR) * jnp.min(ratio, axis=1)


def _gumbel_topk_select(rng, weights, k, cap):
    """Selection mask over `weights` equivalent to multinomial sampling of
    `k` items without replacement (Gumbel top-k; replaces the reference's
    host-side multinomial, brush-train/src/multinomial.rs)."""
    w = jnp.nan_to_num(weights, nan=0.0)
    g = jax.random.gumbel(rng, w.shape)
    score = jnp.where(w > 0.0, jnp.log(w) + g, -jnp.inf)
    order = jnp.argsort(-score)
    rank = jnp.zeros((cap,), jnp.int32).at[order].set(jnp.arange(cap, dtype=jnp.int32))
    return (rank < k) & (w > 0.0)


def refine_step(
    state: TrainState,
    tcfg: TrainConfig,
    view_centers: jnp.ndarray,      # [V,3] camera centers (3D filter)
    view_focals: jnp.ndarray,       # [V] focal px at native res; V=0 disables
) -> tuple[TrainState, RefineStats]:
    """One fully-jitted refine. Consumes state.refine, returns fresh stats."""
    splats = state.splats.fold_min_scale()  # bake the floor (train.rs:420)
    cap = splats.capacity
    it = state.step.astype(jnp.float32)
    progress = it / max(tcfg.total_train_iters, 1)
    rng, k_resample, k_grow = jax.random.split(state.rng, 3)

    alive = jnp.arange(cap) < state.splats.n_alive
    refiner = state.refine
    vis = refiner.visible_count > 0.0

    # --- Prune (train.rs:468-519) ---
    bounds_center = state.bounds_center
    max_allowed = jnp.max(state.bounds_extent) * 100.0
    opac = jax.nn.sigmoid(splats.raw_opacities)
    alpha_low = opac < ALPHA_CUTOFF_MID
    scales = jnp.exp(splats.log_scales)
    scale_big = jnp.any(scales > max_allowed, axis=1)
    out_of_bounds = jnp.any(
        jnp.abs(splats.means - bounds_center) > max_allowed, axis=1)
    row_bad = (
        ~jnp.all(jnp.isfinite(splats.means), axis=1)
        | ~jnp.all(jnp.isfinite(splats.log_scales), axis=1)
        | ~jnp.all(jnp.isfinite(splats.quats), axis=1)
        | ~jnp.all(jnp.isfinite(splats.sh_coeffs.reshape(cap, -1)), axis=1)
        | ~jnp.isfinite(splats.raw_opacities)
    )
    prune = alive & (alpha_low | scale_big | out_of_bounds | row_bad)
    keep = alive & ~prune
    pruned_count = jnp.sum(prune).astype(jnp.int32)
    pruned_non_finite = jnp.sum(alive & row_bad).astype(jnp.int32)

    # --- Compact: kept rows to the front (stable) ---
    perm = jnp.argsort(~keep, stable=True)  # False(kept) sorts first
    n_alive = jnp.sum(keep).astype(jnp.int32)

    def take(x):
        return x[perm]

    params = {k: take(v) for k, v in splats.params().items()}
    opt = {
        name: st.replace(moment1=take(st.moment1), moment2=take(st.moment2))
        for name, st in state.opt.items()
    }
    refine_w = take(refiner.refine_weight)
    vis_cnt = take(refiner.visible_count)
    max_ss = take(refiner.max_radius)
    alive2 = jnp.arange(cap) < n_alive
    # Dead slots: reset params to inert values and zero stale moments.
    params["raw_opacities"] = jnp.where(alive2, params["raw_opacities"],
                                        DEAD_RAW_OPACITY)
    opt = {
        name: st.replace(
            moment1=jnp.where(_bmask(alive2, st.moment1), st.moment1, 0.0),
            moment2=jnp.where(_bmask(alive2, st.moment2), st.moment2, 0.0))
        for name, st in opt.items()
    }
    vis2 = alive2 & (vis_cnt > 0.0)

    # --- Select split candidates (train.rs:521-612) ---
    opac2 = jax.nn.sigmoid(params["raw_opacities"])
    resample_w = jnp.where(vis2, opac2, 0.0)
    sel_resample = _gumbel_topk_select(k_resample, resample_w,
                                       pruned_count, cap)

    headroom_budget = jnp.minimum(tcfg.max_splats, cap)
    sel_oversized = jnp.zeros((cap,), bool)
    if tcfg.split_at_screen_size > 0.0:
        sel_oversized = vis2 & (max_ss > tcfg.split_at_screen_size)

    sel = sel_resample | sel_oversized

    above = vis2 & (refine_w > tcfg.growth_grad_threshold)
    thresh_count = jnp.sum(above)
    grow_target = jnp.round(
        thresh_count.astype(jnp.float32) * tcfg.growth_select_fraction
    ).astype(jnp.int32)
    grow_count = jnp.maximum(grow_target - pruned_count, 0)
    cur = n_alive + jnp.sum(sel).astype(jnp.int32)
    grow_count = jnp.minimum(grow_count, jnp.maximum(headroom_budget - cur, 0))
    grow_count = jnp.where(state.step < tcfg.growth_stop_iter, grow_count, 0)
    grow_w = jnp.where(above, refine_w, 0.0)
    sel = sel | _gumbel_topk_select(k_grow, grow_w, grow_count, cap)

    # Cap total additions by capacity / max_splats: children are allocated
    # in selection-rank order; anything past the budget is dropped.
    sel_rank = jnp.cumsum(sel.astype(jnp.int32)) - 1        # rank among sel
    child_slot = n_alive + sel_rank
    sel = sel & (child_slot < headroom_budget)
    child_slot = jnp.where(sel, child_slot, cap)            # cap -> dropped
    n_added = jnp.sum(sel).astype(jnp.int32)

    # --- Covariance-aware split (train.rs:651-807, constants Appx A) ---
    q_mag = jnp.maximum(jnp.linalg.norm(params["quats"], axis=1,
                                        keepdims=True), 1e-32)
    rots = params["quats"] / q_mag
    cur_scales = jnp.exp(params["log_scales"])
    cur_opac = jax.nn.sigmoid(params["raw_opacities"])
    new_opac = 1.0 - (1.0 - cur_opac) ** FRAC_1_SQRT_2
    new_raw_opac = _inv_sigmoid(
        jnp.clip(new_opac, ALPHA_CUTOFF_MID, 1.0 - ALPHA_CUTOFF_MID))

    scales_sq = cur_scales ** 2
    max_sq = jnp.maximum(jnp.max(scales_sq, axis=1, keepdims=True), 1e-30)
    ratio = scales_sq / max_sq
    if tcfg.split_at_screen_size > 0.0:
        k_max = jnp.minimum(
            tcfg.split_at_screen_size / jnp.maximum(max_ss[:, None], 1e-6),
            FRAC_1_SQRT_2)
    else:
        k_max = jnp.full((cap, 1), FRAC_1_SQRT_2)
    k_axis = 1.0 - ratio * (1.0 - k_max)
    offset = jnp.sqrt(jnp.clip(1.0 - k_axis ** 2, 0.0, None)) * cur_scales
    offset_world = quat_rotate_vec(rots, offset)
    new_log_scales = params["log_scales"] + jnp.log(k_axis)

    selc = sel[:, None]
    new_params = dict(params)
    # Parent in place: mean - offset, shrunk scales, reduced opacity.
    new_params["means"] = jnp.where(selc, params["means"] - offset_world,
                                    params["means"])
    new_params["log_scales"] = jnp.where(selc, new_log_scales,
                                         params["log_scales"])
    new_params["raw_opacities"] = jnp.where(sel, new_raw_opac,
                                            params["raw_opacities"])

    # Child scattered into the dead region (mode=drop discards overflow).
    def scatter_children(arr, child_vals):
        return arr.at[child_slot].set(child_vals, mode="drop")

    new_params["means"] = scatter_children(
        new_params["means"], params["means"] + offset_world)
    new_params["quats"] = scatter_children(new_params["quats"], rots)
    new_params["log_scales"] = scatter_children(
        new_params["log_scales"], new_log_scales)
    new_params["sh_coeffs"] = scatter_children(
        new_params["sh_coeffs"], params["sh_coeffs"])
    new_params["raw_opacities"] = scatter_children(
        new_params["raw_opacities"], new_raw_opac)

    # Both halves of a split start with zero Adam moments (train.rs:755-795);
    # child slots were already zeroed above.
    opt = {
        name: st.replace(
            moment1=jnp.where(_bmask(sel, st.moment1), 0.0, st.moment1),
            moment2=jnp.where(_bmask(sel, st.moment2), 0.0, st.moment2))
        for name, st in opt.items()
    }

    n_alive_out = n_alive + n_added

    # --- Global opacity decay (train.rs:795-803) ---
    t_shrink = tcfg.opac_decay * (1.0 - jnp.clip(progress, 0.0, 1.0))
    alive3 = jnp.arange(cap) < n_alive_out
    decayed = _inv_sigmoid(
        jnp.clip(jax.nn.sigmoid(new_params["raw_opacities"]) - t_shrink,
                 1e-12, 1.0 - 1e-12))
    new_params["raw_opacities"] = jnp.where(alive3, decayed,
                                            new_params["raw_opacities"])

    # --- New bounds + fresh 3D-filter floor (train.rs:619-634) ---
    center, extent = _percentile_bounds(new_params["means"], alive3,
                                        BOUND_PERCENTILE)
    med = median_size(extent)

    new_splats = state.splats.replace(
        means=new_params["means"],
        log_scales=new_params["log_scales"],
        quats=new_params["quats"],
        sh_coeffs=new_params["sh_coeffs"],
        raw_opacities=new_params["raw_opacities"],
        n_alive=n_alive_out,
        min_scale=None,
    )
    if view_focals.shape[0] > 0:
        # Recompute + attach the floor until the freeze point; past it, the
        # bake at the top of this function already folded it permanently, so
        # a zero floor (a no-op in fold_min_scale) is attached instead
        # (train.rs:627-634).
        floor = compute_min_scale(new_params["means"], view_centers, view_focals)
        floor = jnp.where(alive3 & (progress < MIN_SCALE_FREEZE_FRAC),
                          floor, 0.0)
        new_splats = new_splats.replace(min_scale=floor)

    new_state = state.replace(
        splats=new_splats,
        opt=opt,
        refine=RefineRecord.zeros(cap),
        rng=rng,
        median_scale=med,
        bounds_center=center,
        bounds_extent=extent,
    )
    # Decompose the final selection (post budget-truncation) into its three
    # sources; overlaps resolve in priority order oversized > resampled.
    n_over = jnp.sum(sel & sel_oversized).astype(jnp.int32)
    n_res = jnp.sum(sel & sel_resample & ~sel_oversized).astype(jnp.int32)
    stats = RefineStats(
        num_added=n_added,
        num_pruned=pruned_count,
        num_pruned_non_finite=pruned_non_finite,
        total_splats=n_alive_out,
        num_oversized=n_over,
        num_resampled=n_res,
        num_grad_grown=n_added - n_over - n_res,
    )
    return new_state, stats


def _bmask(mask, arr):
    """Broadcast a [cap] bool mask against arr's leading axis."""
    return mask.reshape((-1,) + (1,) * (arr.ndim - 1))
