"""Structured metrics / timing / profiling utilities.

SURVEY §5: the reference communicates progress with bare prints. Here every
fit can record a structured metrics dict (wall time, compile-vs-run split,
iterations, nll, achieved FLOP/s) and `trace` wraps jax.profiler.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax


@dataclass
class FitMetrics:
    name: str = ""
    wall_time_s: float = 0.0
    compile_time_s: float = 0.0
    iterations: int = 0
    nll: float = float("nan")
    extra: dict = field(default_factory=dict)

    def as_dict(self):
        d = {
            "name": self.name,
            "wall_time_s": round(self.wall_time_s, 6),
            "compile_time_s": round(self.compile_time_s, 6),
            "iterations": self.iterations,
            "nll": self.nll,
        }
        d.update(self.extra)
        return d


@contextlib.contextmanager
def timed(metrics: FitMetrics):
    t0 = time.perf_counter()
    yield
    metrics.wall_time_s = time.perf_counter() - t0


def _force(out):
    """Synchronize by SCALAR READBACK. `jax.block_until_ready` is a no-op
    through the remote-TPU tunnel (measured: returns in 0 ms for a 7 s
    computation) — only a host read truly blocks."""
    import jax.numpy as jnp

    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and getattr(leaf, "size", 0):
            float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def time_jitted(fn, *args, reps=3):
    """(compile_time, median_run_time) for a jitted callable — forces
    completion by scalar readback (see `_force`)."""
    t0 = time.perf_counter()
    _force(fn(*args))
    compile_time = time.perf_counter() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _force(fn(*args))
        times.append(time.perf_counter() - t0)
    times.sort()
    return compile_time, times[len(times) // 2]


@contextlib.contextmanager
def trace(path="/tmp/jax-trace"):
    """jax.profiler trace context (view with TensorBoard/perfetto)."""
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def flops_achieved(flops: int, seconds: float) -> float:
    return flops / max(seconds, 1e-12)
