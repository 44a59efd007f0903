"""Tracing / profiling.

The reference's observability is request logs + self-timed webhook sends
(SURVEY.md §5). A TPU framework needs real tracing from the start: this
wraps ``jax.profiler`` for device traces and provides a lightweight
step-timing registry the service layer exposes in /api/health-adjacent
surfaces.
"""

from __future__ import annotations

import contextlib
import statistics
import time


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/sph_pie_trace"):
    """jax.profiler trace context (view with tensorboard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named trace span for host-side phases (shows up in the profile)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StepTimer:
    """Rolling wall-clock stats for repeated phases (blocks until the
    device result is ready, so timings are real device time)."""

    def __init__(self, window: int = 200):
        self.window = window
        self._samples: dict[str, list[float]] = {}

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        import jax

        t0 = time.perf_counter()
        out = {}
        try:
            yield out
        finally:
            if "result" in out:
                jax.block_until_ready(out["result"])
            dt = time.perf_counter() - t0
            buf = self._samples.setdefault(name, [])
            buf.append(dt)
            del buf[: -self.window]

    def stats(self) -> dict:
        out = {}
        for name, xs in self._samples.items():
            out[name] = {
                "count": len(xs),
                "mean_ms": statistics.fmean(xs) * 1e3,
                "p50_ms": statistics.median(xs) * 1e3,
                "max_ms": max(xs) * 1e3,
            }
        return out
