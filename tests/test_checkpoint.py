"""Full-state checkpoint/resume through the public process loop
(SURVEY.md §5.4: params + Adam moments + refine record + RNG — strictly
more than the reference's ply + --start-iter resume)."""

import dataclasses

import jax
import numpy as np

from tests.test_dataset_formats import write_colmap_bin

from brush_tpu.data.formats import LoadConfig
from brush_tpu.process import ProcessConfig, train_process
from brush_tpu.train.checkpoint import (
    checkpoint_meta, load_checkpoint, save_checkpoint)
from brush_tpu.train.config import TrainConfig


def test_save_load_roundtrip_exact(tmp_path):
    from brush_tpu.camera import Camera
    from brush_tpu.train.splat_init import create_random_splats
    from brush_tpu.train.trainer import init_train_state

    rng = np.random.default_rng(0)
    cam = Camera(position=np.array([0.0, 0.0, -4.0]),
                 rotation=np.array([1.0, 0.0, 0.0, 0.0]),
                 fov_x=0.9, fov_y=0.9)
    splats = create_random_splats(32, [cam], rng, scene_scale_override=6.0,
                                  sh_degree=1)
    state = init_train_state(splats, jax.random.PRNGKey(3), 2.0)
    save_checkpoint(tmp_path / "ck", state, iteration=17)

    meta = checkpoint_meta(tmp_path / "ck")
    assert meta["iteration"] == 17
    assert meta["capacity"] == state.splats.capacity

    template = init_train_state(splats, jax.random.PRNGKey(0), 2.0)
    restored = load_checkpoint(tmp_path / "ck", template)
    for a, b in zip(jax.tree_util.tree_leaves(state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_through_process(tmp_path):
    write_colmap_bin(tmp_path / "scene", n_views=2, w=32, h=32)
    tcfg = TrainConfig(total_train_iters=6, refine_every=1000)
    lcfg = LoadConfig(max_resolution=32)
    base = ProcessConfig(eval_every=0, export_every=0, log_every=2,
                         export_path=str(tmp_path / "o_{iter}.ply"),
                         init_count=0, sh_degree=1, use_pallas=False,
                         ckpt_every=4, ckpt_dir=str(tmp_path / "ck"))

    kinds = [m.kind for m in train_process(str(tmp_path / "scene"),
                                           tcfg, lcfg, base)]
    assert "checkpoint" in kinds
    assert checkpoint_meta(tmp_path / "ck")["iteration"] == 4

    # Resume: picks up at iter 4, runs 2 more steps to 6.
    pcfg2 = dataclasses.replace(base, ckpt_every=0,
                                resume_from=str(tmp_path / "ck"))
    msgs = list(train_process(str(tmp_path / "scene"), tcfg, lcfg, pcfg2))
    steps = [m for m in msgs if m.kind == "step"]
    assert steps and steps[0].iter > 4
    assert steps[-1].iter == 6
    assert all(np.isfinite(m.data["loss"]) for m in steps)
