"""Per-stage timing and observability.

Restores (and extends) the reference's vestigial per-stage profiling — the
v1 channels stamped ``processTimeNanos`` into every packet and the report
aggregated it (``/root/reference/sydr/old/channel_abstract.py:298``,
``io/visualisation.py:860-879``). Stages are timed on the host around the
device calls; summaries expose mean/std/max/total and per-signal-second
cost, and rows can be persisted to the results database. A context helper
wraps ``jax.profiler`` trace capture for device-level analysis.
"""

from __future__ import annotations

import contextlib
import time

import numpy as np


class StageTimers:
    def __init__(self):
        self._samples: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def time(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples.setdefault(stage, []).append(
                time.perf_counter() - t0)

    def add(self, stage: str, seconds: float) -> None:
        self._samples.setdefault(stage, []).append(seconds)

    def summary(self) -> dict[str, dict[str, float]]:
        out = {}
        for stage, vals in self._samples.items():
            arr = np.asarray(vals)
            out[stage] = {
                "count": int(arr.size),
                "mean_ms": float(arr.mean() * 1e3),
                "std_ms": float(arr.std() * 1e3),
                "max_ms": float(arr.max() * 1e3),
                "total_s": float(arr.sum()),
            }
        return out

    def store(self, db) -> None:
        for stage, stats in self.summary().items():
            db.add("timing", {"stage": stage, **stats})

    def report(self) -> str:
        lines = [f"{'stage':<18}{'count':>7}{'mean':>10}{'max':>10}"
                 f"{'total':>10}"]
        for stage, s in sorted(self.summary().items()):
            lines.append(
                f"{stage:<18}{s['count']:>7}{s['mean_ms']:>9.2f}ms"
                f"{s['max_ms']:>9.2f}ms{s['total_s']:>9.2f}s")
        return "\n".join(lines)


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace around a code region."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
