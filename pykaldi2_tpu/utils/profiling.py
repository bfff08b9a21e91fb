"""Tracing/profiling hooks (SURVEY.md §6.1).

Reference behavior: none built in — wall-clock batch logging only; users
fell back on external profilers. Here: ``jax.profiler`` trace capture around
training steps (view with xprof/tensorboard) plus a step-fence timer mode.
"""

from __future__ import annotations

import contextlib
import os
import time

import jax


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """Capture a jax.profiler trace into ``trace_dir`` when set."""
    if not trace_dir:
        yield
        return
    os.makedirs(trace_dir, exist_ok=True)
    with jax.profiler.trace(trace_dir):
        yield


class StepTimer:
    """Fenced per-step timing (block_until_ready between steps) for --profile.

    Adds sync overhead — use for diagnosis, not for throughput numbers.
    """

    def __init__(self):
        self.times = []

    @contextlib.contextmanager
    def step(self, result_fn=None):
        t0 = time.perf_counter()
        out = {}
        yield out
        if out.get("sync") is not None:
            jax.block_until_ready(out["sync"])
        self.times.append(time.perf_counter() - t0)

    def summary(self) -> dict:
        if not self.times:
            return {}
        ts = sorted(self.times)
        n = len(ts)
        return {"steps": n, "mean_s": sum(ts) / n, "p50_s": ts[n // 2],
                "p90_s": ts[int(n * 0.9)]}
