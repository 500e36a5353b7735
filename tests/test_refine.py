"""Refine (densify/prune) semantics under fixed capacity."""

import jax
import jax.numpy as jnp
import numpy as np

from brush_tpu.camera import Camera
from brush_tpu.models.splats import DEAD_RAW_OPACITY
from brush_tpu.ops.loss import pack_gt
from brush_tpu.render import RenderConfig, camera_inputs
from brush_tpu.train.config import TrainConfig
from brush_tpu.train.refine import refine_step
from brush_tpu.train.splat_init import create_random_splats
from brush_tpu.train.trainer import SceneBatch, init_train_state, train_step

IMG = (64, 64)
RCFG = RenderConfig(img_size=IMG, sh_degree=0, isect_cap=1 << 13,
                    max_per_tile=512, chunk=32)


def make_state(n=64, cap=256, seed=5):
    rng = np.random.default_rng(seed)
    cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9)
    splats = create_random_splats(n, [cam], rng, scene_scale_override=6.0,
                                  sh_degree=0, capacity=cap)
    state = init_train_state(splats, jax.random.PRNGKey(0))
    return state, cam


def run_steps(state, cam, n_steps, tcfg):
    y, x = np.mgrid[0:IMG[1], 0:IMG[0]]
    gt = np.stack([x / 64, y / 64, 0.5 * np.ones_like(x)], -1).astype(np.float32)
    batch = SceneBatch(gt_packed=jnp.asarray(pack_gt(gt)),
                       cam=camera_inputs(cam, IMG))
    step = jax.jit(lambda s, b: train_step(s, b, tcfg, RCFG))
    for _ in range(n_steps):
        state, _, _ = step(state, batch)
    return state


def test_refine_prunes_dead_and_splits():
    state, cam = make_state()
    tcfg = TrainConfig(total_train_iters=1000, growth_grad_threshold=1e-6)

    # Poison some splats: low opacity + one NaN row.
    raw = np.asarray(state.splats.raw_opacities).copy()
    raw[:8] = -10.0  # sigmoid ~ 5e-5 < 1/255 -> prune
    means = np.asarray(state.splats.means).copy()
    means[8] = np.nan
    state = state.replace(splats=state.splats.replace(
        raw_opacities=jnp.asarray(raw), means=jnp.asarray(means)))

    state = run_steps(state, cam, 3, tcfg)
    n_before = int(state.splats.n_alive)

    focals = jnp.asarray([70.0])
    centers = jnp.asarray([[0.0, 0.0, -4.0]])
    rstep = jax.jit(lambda s: refine_step(s, tcfg, centers, focals))
    state2, stats = rstep(state)

    assert int(stats.num_pruned) >= 9
    assert int(stats.num_pruned_non_finite) >= 1
    assert int(stats.total_splats) == int(state2.splats.n_alive)
    assert int(state2.splats.n_alive) <= state.splats.capacity

    # Live prefix invariant: all dead slots inert.
    cap = state2.splats.capacity
    alive = np.arange(cap) < int(state2.splats.n_alive)
    raw2 = np.asarray(state2.splats.raw_opacities)
    sig = 1 / (1 + np.exp(-raw2[~alive]))
    assert (sig < 1 / 255).all(), "dead slots must be invisible"

    # All params finite on live rows.
    for arr in [state2.splats.means, state2.splats.log_scales,
                state2.splats.quats, state2.splats.raw_opacities]:
        assert np.isfinite(np.asarray(arr)[alive if np.asarray(arr).shape[0] == cap else slice(None)]).all()

    # 3D filter attached.
    assert state2.splats.min_scale is not None
    assert np.isfinite(np.asarray(state2.splats.min_scale)).all()

    # Training continues after refine.
    state3 = run_steps(state2, cam, 2, tcfg)
    assert np.isfinite(float(jnp.sum(state3.splats.means[alive]))).real is not None


def test_refine_respects_capacity():
    state, cam = make_state(n=200, cap=256)
    # Aggressive growth so it would exceed capacity if uncapped.
    tcfg = TrainConfig(total_train_iters=1000, growth_grad_threshold=1e-9,
                       growth_select_fraction=1.0)
    state = run_steps(state, cam, 3, tcfg)
    focals = jnp.asarray([70.0])
    centers = jnp.asarray([[0.0, 0.0, -4.0]])
    state2, stats = jax.jit(lambda s: refine_step(s, tcfg, centers, focals))(state)
    assert int(state2.splats.n_alive) <= 256


def test_split_conserves_center_of_mass():
    """Parent at mean-offset, child at mean+offset: centroid preserved."""
    state, cam = make_state(n=32, cap=128)
    tcfg = TrainConfig(total_train_iters=1000, growth_grad_threshold=1e-9,
                       growth_select_fraction=1.0, opac_decay=0.0)
    state = run_steps(state, cam, 3, tcfg)
    means_before = np.asarray(state.splats.means)
    n_before = int(state.splats.n_alive)

    focals = jnp.asarray([70.0])
    centers = jnp.asarray([[0.0, 0.0, -4.0]])
    state2, stats = jax.jit(lambda s: refine_step(s, tcfg, centers, focals))(state)
    n_after = int(state2.splats.n_alive)
    if int(stats.num_added) == 0 or int(stats.num_pruned) > 0:
        return  # nothing grew / pruning confounds the invariant
    # A split is centroid-preserving: parent -> m - o, child -> m + o, so
    # sum_after = sum_before + sum(means of split parents). When every live
    # splat split (full growth), the mean position is exactly preserved.
    if n_after == 2 * n_before:
        m_before = means_before[:n_before].mean(axis=0)
        m_after = np.asarray(state2.splats.means)[:n_after].mean(axis=0)
        np.testing.assert_allclose(m_after, m_before, rtol=1e-4, atol=1e-3)
