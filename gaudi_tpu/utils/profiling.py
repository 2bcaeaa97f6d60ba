"""Profiling hooks: jax.profiler traces + lightweight phase timers.

The reference has no tracing at all (SURVEY.md §5 — wall-clock prints only).
Here every trainer/CLI can opt into a real XLA trace viewable in
TensorBoard/Perfetto, plus a zero-dependency phase timer for coarse
host-side accounting.
"""

from __future__ import annotations

import contextlib
import json
import os
import time
from collections import defaultdict


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (XLA ops, HBM, fusion) to log_dir."""
    import jax

    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class PhaseTimer:
    """Accumulating wall-clock phase timer.

    with timer.phase("sample"): ...
    timer.summary() -> {"sample": {"seconds": ..., "calls": ...}, ...}
    """

    def __init__(self):
        self._acc = defaultdict(float)
        self._calls = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._acc[name] += time.perf_counter() - t0
            self._calls[name] += 1

    def summary(self) -> dict:
        return {
            k: {"seconds": round(v, 4), "calls": self._calls[k]}
            for k, v in sorted(self._acc.items(), key=lambda kv: -kv[1])
        }

    def dump(self, path: str):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)
