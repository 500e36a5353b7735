"""Tracing / profiling hooks.

Counterpart of the reference's tracing spans + Tracy profiler option
(SURVEY.md §5.1): `stage(...)` wraps pipeline stages in jax.named_scope so
they show up named in XLA/xprof traces; `profile_trace(...)` captures a
TensorBoard-compatible xplane trace directory (the jax.profiler equivalent
of the reference's `tracy` feature)."""

from __future__ import annotations

import contextlib
import time

import jax


def stage(name: str):
    """Named scope visible in HLO metadata and profiler traces."""
    return jax.named_scope(name)


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a device trace: `with profile_trace('/tmp/trace'): step()`.
    View with TensorBoard or xprof."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def wall_timer(label: str, sink=print):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        sink(f"{label}: {(time.perf_counter() - t0) * 1000:.2f} ms")


def memory_stats() -> dict:
    """Device memory usage (the reference logs client.memory_usage() to
    rerun, train_stream.rs:434-441)."""
    stats = {}
    for d in jax.local_devices():
        s = d.memory_stats() or {}
        stats[str(d)] = {
            "bytes_in_use": s.get("bytes_in_use"),
            "peak_bytes_in_use": s.get("peak_bytes_in_use"),
            "bytes_limit": s.get("bytes_limit"),
        }
    return stats
