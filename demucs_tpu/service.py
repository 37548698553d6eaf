"""Cross-request continuous batching: a single device-feeder thread.

The reference's only service-level parallelism is a thread per track
sharing one model read-only (cli-apps/threaded_inference.hpp:29-193).
The TPU translation is batching, not locking: one feeder thread owns
the chip; concurrent requests submit segment groups that are assembled
into shared ``batch_size`` device calls (segments from many tracks
fill one batch — the server-side analog of
pipeline.Separator.separate_many's continuous batching), and
whole-track fused programs run as exclusive items on the same queue.
A streaming session therefore never wedges the device between chunks:
each of its pushes is just more segments in the shared stream.
"""

from __future__ import annotations

import collections
import threading
import time
from concurrent.futures import Future
from typing import Callable

import numpy as np

from .utils.progress import ProgressCallback, null_progress


class _SegItem:
    """A contiguous group of segments from one request."""

    __slots__ = ("segs", "fut", "cursor", "parts", "delivered", "failed")

    def __init__(self, segs: np.ndarray, fut: Future):
        self.segs = segs
        self.fut = fut
        self.cursor = 0        # segments scheduled into batches
        self.delivered = 0     # segments whose outputs have landed
        self.parts: list[np.ndarray] = []
        self.failed = False

    @property
    def n(self) -> int:
        return self.segs.shape[0]


class _CallItem:
    """An exclusive device call (e.g. a fused whole-track program)."""

    __slots__ = ("fn", "fut")

    def __init__(self, fn: Callable, fut: Future):
        self.fn = fn
        self.fut = fut


class DeviceFeeder:
    """Single-owner device thread with cross-request segment batching.

    separator: a pipeline.Separator whose compiled batch program the
    feeder drives (``separator.options.batch_size`` segments per call).
    ``fill_wait_s``: how long a partial batch waits for more segments
    from concurrent requests before running padded (default 3 ms —
    negligible next to a device step, long enough for a concurrent
    handler thread to enqueue).
    """

    def __init__(self, separator, fill_wait_s: float = 0.003):
        self._sep = separator
        self._B = max(1, separator.options.batch_size)
        self._fill_wait = fill_wait_s
        self._cv = threading.Condition()
        self._items: collections.deque = collections.deque()
        self._closed = False
        # observability: how well cross-request batching is working
        self.stats = {"device_calls": 0, "segments": 0, "padded": 0,
                      "exclusive_calls": 0}
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="device-feeder")
        self._thread.start()

    # --- submission (thread-safe) --------------------------------------

    def submit_segments(self, segs: np.ndarray) -> Future:
        """(n, C, seg) segment batch -> Future of (n, S, C, seg) f32
        stems (post-fetch, int16 transfer already decoded)."""
        segs = np.asarray(segs)
        fut: Future = Future()
        if segs.shape[0] == 0:
            fut.set_result(np.zeros((0,), np.float32))
            return fut
        item = _SegItem(segs, fut)
        with self._cv:
            if self._closed or not self._thread.is_alive():
                raise RuntimeError("DeviceFeeder is closed or dead")
            self._items.append(item)
            self._cv.notify()
        return fut

    def run_exclusive(self, fn: Callable) -> Future:
        """Queue fn() as an exclusive device call (fused programs,
        warmup); runs in FIFO order with the segment batches."""
        fut: Future = Future()
        with self._cv:
            if self._closed or not self._thread.is_alive():
                raise RuntimeError("DeviceFeeder is closed or dead")
            self._items.append(_CallItem(fn, fut))
            self._cv.notify()
        return fut

    def separate(self, audio: np.ndarray,
                 progress: ProgressCallback = null_progress) -> np.ndarray:
        """Full-track separation through the shared batch stream —
        (C, N) -> (S, C, N). Thread-safe: the host-side prepare/finish
        math runs on the caller's thread, only the device calls are
        funneled (and merged with other requests' segments)."""
        batch, state = self._sep._prepare(audio, progress)
        out = self.submit_segments(batch).result()
        progress(1.0, f"segments {batch.shape[0]}/{batch.shape[0]}")
        return self._sep._finish(out, state)

    def close(self, timeout: float = 30.0) -> None:
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout=timeout)

    # --- feeder loop ----------------------------------------------------

    def _fail(self, items, exc: BaseException) -> None:
        for it in items:
            it.failed = True
            try:
                it.fut.set_exception(exc)
            except Exception:
                pass  # already resolved

    def _loop(self) -> None:
        while True:
            with self._cv:
                while not self._items and not self._closed:
                    self._cv.wait()
                if not self._items and self._closed:
                    return
                head = self._items[0]
                if isinstance(head, _CallItem):
                    self._items.popleft()
            if isinstance(head, _CallItem):
                self.stats["exclusive_calls"] += 1
                try:
                    head.fut.set_result(head.fn())
                except Exception as e:
                    try:
                        head.fut.set_exception(e)
                    except Exception:
                        pass
                continue

            # assemble one batch: drain segment items in FIFO order up
            # to B, waiting up to fill_wait for concurrent producers to
            # top off a partial batch; a _CallItem boundary ends the
            # batch (strict FIFO keeps fused calls from starving)
            parts: list[tuple[_SegItem, int, int]] = []
            fill = 0
            deadline = time.monotonic() + self._fill_wait
            while fill < self._B:
                with self._cv:
                    nxt = self._items[0] if self._items else None
                    if isinstance(nxt, _SegItem):
                        take = min(self._B - fill, nxt.n - nxt.cursor)
                        parts.append((nxt, nxt.cursor, take))
                        nxt.cursor += take
                        fill += take
                        if nxt.cursor == nxt.n:
                            self._items.popleft()
                        continue
                if nxt is not None or self._closed:
                    break  # exclusive call next, or shutting down
                if time.monotonic() >= deadline:
                    break
                with self._cv:
                    if not self._items:
                        self._cv.wait(timeout=0.001)
            if not parts:
                continue

            batch = np.concatenate([it.segs[c:c + k] for it, c, k in parts]) \
                if len(parts) > 1 else \
                parts[0][0].segs[parts[0][1]:parts[0][1] + parts[0][2]]
            pad = self._B - batch.shape[0]
            if pad:
                batch = np.concatenate(
                    [batch, np.zeros((pad,) + batch.shape[1:], batch.dtype)])
            self.stats["device_calls"] += 1
            self.stats["segments"] += fill
            self.stats["padded"] += pad
            try:
                placed = self._sep._place(batch)
                out = self._sep._call_device(placed)
            except Exception as e:
                affected = {id(it): it for it, _, _ in parts}
                with self._cv:
                    for it in list(affected.values()):
                        try:
                            self._items.remove(it)
                        except ValueError:
                            pass
                self._fail(affected.values(), e)
                continue

            off = 0
            for it, _, k in parts:
                it.parts.append(out[off:off + k])
                it.delivered += k
                off += k
                if it.delivered == it.n and not it.failed:
                    try:
                        it.fut.set_result(
                            np.concatenate(it.parts)
                            if len(it.parts) > 1 else it.parts[0])
                    except Exception:
                        pass
