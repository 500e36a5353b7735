"""Training telemetry: stats stream + image dumps.

Counterpart of brush-rerun (crates/brush-rerun/src/visualize_tools.rs):
rerun.io isn't available in this environment, so telemetry writes a JSONL
stats stream plus PNG snapshots (eval renders, splat histograms as npz) to a
run directory — consumable by any dashboard. The TrainMessage stream
(process.py) remains the typed in-process channel (message.rs:8-68)."""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np


class TelemetryLogger:
    def __init__(self, log_dir: str | Path):
        self.dir = Path(log_dir)
        self.dir.mkdir(parents=True, exist_ok=True)
        self._f = open(self.dir / "stats.jsonl", "a")
        self._t0 = time.time()

    def log_scalars(self, step: int, **scalars) -> None:
        rec = {"step": step, "t": round(time.time() - self._t0, 3)}
        rec.update({k: (float(v) if v is not None else None)
                    for k, v in scalars.items()})
        self._f.write(json.dumps(rec) + "\n")
        self._f.flush()

    def log_image(self, step: int, name: str, img: np.ndarray) -> None:
        """img: [H,W,3|4] float in [0,1] or uint8."""
        from PIL import Image
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(img).save(self.dir / f"{name}_{step:06d}.png")

    def log_splat_distribution(self, step: int, splats) -> None:
        """Histogram snapshots of splat stats (visualize_tools.rs splat
        distribution logging)."""
        n = int(splats.n_alive)
        np.savez(
            self.dir / f"splat_dist_{step:06d}.npz",
            log_scales=np.asarray(splats.log_scales[:n]),
            raw_opacities=np.asarray(splats.raw_opacities[:n]),
            means=np.asarray(splats.means[:n]),
        )

    def close(self):
        self._f.close()
