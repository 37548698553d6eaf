"""Progress reporting — the reference's only observability hook
(`ProgressCallback`, reference src/model.hpp:17), kept API-compatible:
a callable (fraction: float, message: str) -> None.
"""

from __future__ import annotations

import sys
import time
from typing import Callable

ProgressCallback = Callable[[float, str], None]


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
