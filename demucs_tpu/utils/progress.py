"""Progress reporting — the reference's only observability hook
(`ProgressCallback`, reference src/model.hpp:17), kept API-compatible:
a callable (fraction: float, message: str) -> None.

Two granularities:
  * per-device-batch (default): the pipeline reports after each batched
    segment call;
  * intra-segment stages (reference parity: 26 steps per v4 segment,
    src/model_inference.cpp:156-346): the model graphs contain
    `report_stage` markers that lower to `jax.debug.callback`s when
    tracing happens inside `stage_tracing()`. The callbacks fire during
    every execution and route to whatever sink `stage_sink()` has
    installed at that moment (the trace is shape-cached; the sink is
    looked up at run time, so one compiled graph serves any callback).
"""

from __future__ import annotations

import contextlib
import sys
import time
from typing import Callable

ProgressCallback = Callable[[float, str], None]

# trace-time switch: model graphs only embed debug callbacks when this
# is True while they are being traced (keeps the bench/serving graphs
# callback-free unless fine progress was requested).
_TRACE_STAGES = False
# run-time sink for stage events from inside compiled graphs
_STAGE_SINK: ProgressCallback | None = None


@contextlib.contextmanager
def stage_tracing():
    """Enable intra-segment stage markers for graphs traced inside."""
    global _TRACE_STAGES
    prev = _TRACE_STAGES
    _TRACE_STAGES = True
    try:
        yield
    finally:
        _TRACE_STAGES = prev


@contextlib.contextmanager
def stage_sink(cb: ProgressCallback):
    """Route stage events from executing graphs to `cb`.

    jax.debug.callback delivery is asynchronous: without a barrier,
    callbacks still in flight when the context exits would be dropped
    (sink already None) or hit the NEXT batch's sink with a stale batch
    index. effects_barrier() drains them before the sink is swapped."""
    global _STAGE_SINK
    prev = _STAGE_SINK
    _STAGE_SINK = cb
    try:
        yield
    finally:
        import jax

        jax.effects_barrier()
        _STAGE_SINK = prev


def _emit_stage(fraction: float, message: str) -> None:
    sink = _STAGE_SINK
    if sink is not None:
        sink(fraction, message)


def report_stage(fraction: float, message: str) -> None:
    """Stage marker for model graphs (no-op unless traced in
    stage_tracing()). fraction/message are Python constants at trace
    time, so the callback carries no device data and adds no transfer."""
    if not _TRACE_STAGES:
        return
    import functools

    import jax

    jax.debug.callback(functools.partial(_emit_stage, fraction, message))


def null_progress(fraction: float, message: str) -> None:
    pass


def print_progress(fraction: float, message: str) -> None:
    print(f"[{fraction * 100:5.1f}%] {message}", file=sys.stderr)


class TimedProgress:
    """Progress callback that also records per-stage wall times."""

    def __init__(self, inner: ProgressCallback = null_progress):
        self.inner = inner
        self.events: list[tuple[float, float, str]] = []
        self._t0 = time.monotonic()

    def __call__(self, fraction: float, message: str) -> None:
        self.events.append((time.monotonic() - self._t0, fraction, message))
        self.inner(fraction, message)
