"""LOD baking tests (train/lod.py vs the reference's lod.rs).

The reference accumulates the 6x6 sensitivity Hessian sum(J J^T) exactly
per pixel (lod.rs:78); our production path estimates it with Hutchinson
probes. These tests lock (a) the estimator against the exact jacrev
accumulation on a small scene, (b) decimation set semantics (lod.rs:13-42),
and (c) the e2e `_lodN.ply` shrink through the process loop
(train_stream.rs:220-291).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from brush_tpu.camera import Camera
from brush_tpu.models.splats import DEAD_RAW_OPACITY, from_raw
from brush_tpu.render import RenderConfig, camera_inputs
from brush_tpu.train.lod import decimate_to_count, pup_scores


def _scene(n=6, seed=0):
    """Splats with well-separated visual importance: opacity and scale
    both shrink with index, so PUP score must decrease with index."""
    rng = np.random.default_rng(seed)
    means = np.zeros((n, 3), np.float32)
    means[:, 0] = np.linspace(-2.0, 2.0, n)
    means[:, 1] = rng.uniform(-0.5, 0.5, n)
    means[:, 2] = 0.0
    log_scales = np.tile(
        np.linspace(np.log(0.45), np.log(0.02), n)[:, None],
        (1, 3)).astype(np.float32)
    quats = np.tile(np.array([1.0, 0, 0, 0], np.float32), (n, 1))
    sh = np.zeros((n, 1, 3), np.float32)
    sh[:, 0, :] = rng.uniform(0.4, 2.0, (n, 3))
    raw_op = np.linspace(3.0, -1.0, n).astype(np.float32)
    return from_raw(jnp.asarray(means), jnp.asarray(log_scales),
                    jnp.asarray(quats), jnp.asarray(sh),
                    jnp.asarray(raw_op))


def _cam_cfg():
    cam = Camera(position=np.array([0.0, 0.0, -6.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=1.1, fov_y=0.9)
    img = (48, 32)
    rcfg = RenderConfig(img_size=img, sh_degree=0, isect_cap=1 << 12,
                        use_pallas=False)
    return camera_inputs(cam, img), rcfg


_EXACT_CACHE = {}


def _exact_scores():
    """Exact scores are ~40 s of sequential one-hot vjp chunks on a 1-CPU
    host; two tests consume them, so compute once."""
    if "s" not in _EXACT_CACHE:
        splats = _scene()
        cam, rcfg = _cam_cfg()
        _EXACT_CACHE["s"] = np.asarray(
            pup_scores(splats, [cam], rcfg, jax.random.PRNGKey(0),
                       exact=True))
    return _EXACT_CACHE["s"]


def test_hutchinson_tracks_exact_scores():
    """The probe estimator must reproduce the exact jacrev-accumulated
    score ranking (and roughly the values): same top-half set, high
    correlation. Convergence is O(1/sqrt(K)); K=64 probes on a 6-splat
    scene is far past the noise floor for ranking."""
    splats = _scene()
    cam, rcfg = _cam_cfg()
    exact = _exact_scores()
    est = np.asarray(pup_scores(splats, [cam], rcfg,
                                jax.random.PRNGKey(1), n_probes=64))
    assert np.all(np.isfinite(exact)) and np.all(np.isfinite(est))
    k = 3
    assert set(np.argsort(-exact)[:k]) == set(np.argsort(-est)[:k])
    r = np.corrcoef(exact, est)[0, 1]
    assert r > 0.97, f"estimator/exact correlation too low: {r}"


def test_exact_scores_monotone_with_importance():
    """Big opaque splats must outscore small faint ones — the property
    decimation relies on (lod.rs keeps the top scores)."""
    exact = _exact_scores()
    # Index 0 is the biggest/most opaque, index n-1 the smallest/faintest.
    assert exact[0] > exact[-1] + 1.0
    assert np.argmax(exact) == 0


def test_decimate_keeps_top_score_set():
    splats = _scene()
    scores = jnp.asarray(np.array([5.0, 1.0, 9.0, 3.0, 7.0, 2.0],
                                  np.float32))
    out = decimate_to_count(splats, scores, keep_count=3)
    assert int(out.n_alive) == 3
    # Kept (front) slots must be exactly the top-3 scorers' params.
    top = np.argsort(-np.asarray(scores))[:3]
    want = np.asarray(splats.means)[top]
    got = np.asarray(out.means[:3])
    np.testing.assert_allclose(np.sort(got, axis=0), np.sort(want, axis=0),
                               rtol=1e-6)
    # Dead tail is inert: raw opacity at the dead sentinel.
    assert np.all(np.asarray(out.raw_opacities[3:]) == DEAD_RAW_OPACITY)


def test_decimate_ignores_dead_tail():
    """Scores on dead slots (past n_alive) must never win a keep slot."""
    splats = _scene()
    splats = splats.replace(n_alive=jnp.asarray(4, jnp.int32))
    scores = jnp.asarray(np.array([1.0, 2.0, 3.0, 4.0, 100.0, 100.0],
                                  np.float32))
    out = decimate_to_count(splats, scores, keep_count=2)
    assert int(out.n_alive) == 2
    kept_x = np.sort(np.asarray(out.means[:2, 0]))
    want_x = np.sort(np.asarray(splats.means[[2, 3], 0]))
    np.testing.assert_allclose(kept_x, want_x, rtol=1e-6)


def test_lod_export_shrinks_e2e(tmp_path):
    from brush_tpu.data.formats import LoadConfig
    from brush_tpu.io.ply import load_splat_ply
    from brush_tpu.process import ProcessConfig, train_process
    from brush_tpu.train.config import TrainConfig
    from tests.test_dataset_formats import write_colmap_bin

    write_colmap_bin(tmp_path / "scene", n_views=3, w=32, h=32)
    tcfg = TrainConfig(total_train_iters=4, refine_every=100,
                       lod_levels=2, lod_refine_steps=2,
                       lod_decimation_keep=50)
    lcfg = LoadConfig(max_resolution=32)
    pcfg = ProcessConfig(eval_every=0, export_every=0, log_every=4,
                         export_path=str(tmp_path / "out.ply"),
                         init_count=16, sh_degree=0, use_pallas=False)
    msgs = list(train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg))
    lod_msgs = [m for m in msgs
                if m.kind == "export" and "lod_level" in m.data]
    assert [m.data["lod_level"] for m in lod_msgs] == [1, 2]

    def n_splats(p):
        return load_splat_ply(str(tmp_path / p)).num_splats

    n0, n1, n2 = (n_splats("out.ply"), n_splats("out_lod1.ply"),
                  n_splats("out_lod2.ply"))
    assert n1 == n0 // 2 and n2 == n1 // 2, (n0, n1, n2)
