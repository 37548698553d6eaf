"""Profiling helpers.

The reference's only profiling is external /usr/bin/time sweeps
(reference scripts/run_benchmarks.sh, SURVEY.md §5). Here: a context
manager around the JAX profiler (TensorBoard-compatible traces) and a
wall-clock stage timer that composes with the ProgressCallback hook.
"""

from __future__ import annotations

import contextlib
import json
import time

import jax

from .progress import TimedProgress


@contextlib.contextmanager
def trace(logdir: str = "/tmp/demucs_tpu_trace"):
    """Capture a JAX profiler trace (view with TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing via the progress hook.

    >>> timer = StageTimer()
    >>> separator(audio, progress=timer)
    >>> print(timer.report())
    """

    def __init__(self):
        self._progress = TimedProgress()

    def __call__(self, fraction: float, message: str) -> None:
        self._progress(fraction, message)

    def report(self) -> str:
        events = self._progress.events
        lines = []
        for i, (t, frac, msg) in enumerate(events):
            dt = t - (events[i - 1][0] if i else 0.0)
            lines.append({"t": round(t, 3), "stage_s": round(dt, 3),
                          "fraction": round(frac, 3), "message": msg})
        return "\n".join(json.dumps(x) for x in lines)


def fence(x) -> float:
    """Reliable completion fence: host-fetch a scalar reduction.

    On tunneled TPU platforms block_until_ready() can return before the
    device finishes (observed on axon); fetching bytes is the only fence.
    """
    import jax.numpy as jnp

    t0 = time.perf_counter()
    float(jnp.asarray(x).astype(jnp.float32).sum())
    return time.perf_counter() - t0
