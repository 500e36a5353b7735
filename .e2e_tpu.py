"""End-to-end CLI-style training on the REAL TPU: synthetic COLMAP scene,
512x384 views, 400 steps with refine — measures in-situ steps/s."""
import pathlib, sys, time
import numpy as np
import jax
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
sys.path.insert(0, 'tests')
from test_dataset_formats import write_colmap_bin
from brush_tpu.data.formats import LoadConfig
from brush_tpu.process import ProcessConfig, train_process
from brush_tpu.train.config import TrainConfig

root = pathlib.Path('/tmp/e2e_scene')
root.mkdir(exist_ok=True)
write_colmap_bin(root / 'scene', n_views=6, w=512, h=384)

tcfg = TrainConfig(total_train_iters=400, refine_every=100)
lcfg = LoadConfig(max_resolution=512)
pcfg = ProcessConfig(eval_every=400, export_every=0, log_every=50,
                     export_path='/tmp/e2e_scene/out_{iter}.ply',
                     init_count=20000, sh_degree=3, use_pallas=True)
t0 = time.perf_counter()
for msg in train_process(str(root / 'scene'), tcfg, lcfg, pcfg):
    if msg.kind in ("step", "refine", "eval", "export"):
        d = {k: (round(v, 4) if isinstance(v, float) else v)
             for k, v in msg.data.items()}
        print(f"[{time.perf_counter()-t0:7.1f}s] {msg.kind} it={msg.iter} {d}",
              flush=True)
