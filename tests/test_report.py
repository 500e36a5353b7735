"""HTML run-report generation (utils/report.py) — the brush-rerun
visual-telemetry substitute (visualize_tools.rs:86-707)."""

import json

import numpy as np

from brush_tpu.utils.report import write_report
from brush_tpu.utils.telemetry import TelemetryLogger


def test_report_from_telemetry_run(tmp_path, rng):
    telem = TelemetryLogger(tmp_path)
    for it in range(0, 200, 10):
        telem.log_scalars(it, loss=1.0 / (it + 1), psnr=20 + it * 0.05,
                          num_splats=1000 + it * 5)

    class FakeSplats:
        n_alive = 50
        log_scales = rng.standard_normal((64, 3)).astype(np.float32)
        raw_opacities = rng.standard_normal(64).astype(np.float32)
        means = rng.standard_normal((64, 3)).astype(np.float32)

    telem.log_splat_distribution(190, FakeSplats())
    telem.log_image(190, "eval_v0", rng.uniform(0, 1, (24, 32, 3)))
    telem.close()

    out = write_report(tmp_path)
    html = out.read_text()
    assert out.name == "report.html"
    for frag in ("loss", "psnr", "num_splats", "data:image/png;base64",
                 "log_scales", "svg"):
        assert frag in html, frag
    # Hover layer + crosshair shipped (interaction rule).
    assert "data-pts" in html and "mousemove" in html


def test_report_empty_dir(tmp_path):
    out = write_report(tmp_path)
    assert out.exists()
    assert "brush_tpu" in out.read_text()


def test_report_handles_corrupt_lines(tmp_path):
    (tmp_path / "stats.jsonl").write_text(
        json.dumps({"step": 0, "loss": 1.0}) + "\nnot json\n"
        + json.dumps({"step": 1, "loss": 0.5}) + "\n")
    assert write_report(tmp_path).exists()
