"""Profiling + metrics hooks (SURVEY.md §5: the reference has none beyond
example-main chrono timing; this is the engine-level observability layer).

- `StageTimer`: named per-stage wall timing with summaries (the structured
  version of the reference mains' median/mean print).
- `device_trace`: context manager around jax.profiler for TPU traces
  viewable in TensorBoard/XProf.
- `MetricsLog`: append-only JSONL metrics (tracked points, inliers, map
  size per frame) for offline analysis.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict
from typing import Optional

import numpy as np


class StageTimer:
    def __init__(self):
        self.samples = defaultdict(list)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def summary(self, skip_warmup: int = 3) -> dict:
        out = {}
        for name, xs in self.samples.items():
            arr = np.asarray(xs[skip_warmup:] if len(xs) > skip_warmup * 2 else xs)
            out[name] = {
                "median_ms": float(np.median(arr) * 1000),
                "mean_ms": float(np.mean(arr) * 1000),
                "count": len(xs),
            }
        return out


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (TPU timeline) around a code region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class MetricsLog:
    def __init__(self, path: Optional[str] = None):
        self.path = path
        self._f = open(path, "a") if path else None

    def log(self, **kv):
        if self._f is not None:
            self._f.write(json.dumps(kv) + "\n")

    def close(self):
        if self._f:
            self._f.close()
            self._f = None
