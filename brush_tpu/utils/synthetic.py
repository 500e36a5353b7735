"""Synthetic benchmark scenes matching the reference's generator
(brush-bench-test/src/benches.rs:23-95): clustered positions in a
[-5,5]x[-3,3]x[-10,10] box, log-scales ln(U[0.01, 0.1]) with per-axis
variation, uniform random unit quats, random DC colors, opacity raw
U[0.05, 1.0] pre-sigmoid-space."""

from __future__ import annotations

import numpy as np

from brush_tpu.models.splats import Splats, from_raw
from brush_tpu.ops.sh import num_sh_coeffs


def bench_splats(count: int, sh_degree: int = 3, seed: int = 42,
                 capacity: int | None = None) -> Splats:
    rng = np.random.default_rng(seed)
    means = np.stack([
        rng.uniform(-5.0, 5.0, count),
        rng.uniform(-3.0, 3.0, count),
        rng.uniform(-10.0, 10.0, count),
    ], -1).astype(np.float32)

    base = np.log(rng.uniform(0.01, 0.1, count)).astype(np.float32)
    var = rng.uniform(0.8, 1.2, (count, 2)).astype(np.float32)
    log_scales = np.stack([base, base * var[:, 0], base * var[:, 1]], -1)

    # Uniform random rotations (Shoemake).
    u1, u2, u3 = rng.uniform(0, 1, (3, count))
    quats = np.stack([
        np.sqrt(1 - u1) * np.sin(2 * np.pi * u2),
        np.sqrt(1 - u1) * np.cos(2 * np.pi * u2),
        np.sqrt(u1) * np.sin(2 * np.pi * u3),
        np.sqrt(u1) * np.cos(2 * np.pi * u3),
    ], -1).astype(np.float32)

    k = num_sh_coeffs(sh_degree)
    sh = np.zeros((count, k, 3), np.float32)
    sh[:, 0] = rng.uniform(0.1, 0.9, (count, 3))

    opac = rng.uniform(0.05, 1.0, count).astype(np.float32)
    return from_raw(means, log_scales, quats, sh, opac, capacity=capacity)
