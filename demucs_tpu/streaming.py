"""Streaming (chunked, stateful) separation — net-new vs the reference.

The reference (and upstream demucs) is strictly offline: the whole
track is segmented, inferred, overlap-added (src/model_apply.cpp). For
live/low-latency serving this module reproduces the exact same
segment/overlap-add math incrementally: feed audio in arbitrary-size
chunks, receive finalized stems as soon as no future segment can still
contribute to them. Latency bound: one segment + one stride of audio
(~13.65 s at the stock 7.8 s segment / 25% overlap; pass a smaller
segment_samples for interactive use).

Semantics vs the offline pipeline (pipeline.Separator):
  * identical triangular overlap-add, segment grid, and tail padding —
    with the SAME normalization statistics and shift disabled, the
    streamed output is bit-near the offline output (tested);
  * track-level mean/std normalization needs the whole track offline;
    here the statistics run causally over the first `stats_seconds` of
    audio and freeze (or pass fixed `stats=(mean, std)` for parity);
  * no shift trick (it needs the whole track).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from . import config as C
from .pipeline import triangle_weight


class StreamingSeparator:
    """Stateful chunked separation.

    model_fn(params, mix(1, C, seg)) -> (1, S, C, seg).

    push(chunk (C, n)) -> (S, C, m): the newly finalized stems
    (m may be 0 while the window fills).
    flush() -> (S, C, rest): pads and drains the tail; resets state.
    """

    def __init__(self, model_fn: Callable, params, num_sources: int,
                 segment_samples: int = C.SEGMENT_SAMPLES,
                 overlap: float = C.OVERLAP,
                 transition_power: float = C.TRANSITION_POWER,
                 stats: tuple[float, float] | None = None,
                 stats_seconds: float = 10.0):
        self._fn = jax.jit(model_fn)
        self.params = jax.tree.map(jnp.asarray, params)
        self.num_sources = num_sources
        self.segment = int(segment_samples)
        self.stride = int((1 - overlap) * self.segment)
        self._weight = triangle_weight(self.segment, transition_power)
        self._stats = stats
        self._stats_n_target = int(stats_seconds * C.SAMPLE_RATE)
        self.reset()

    def reset(self) -> None:
        self._in: np.ndarray | None = None     # raw audio buffer (C, n)
        self._consumed = 0                     # in-buffer trim offset
        self._next_off = 0                     # next segment offset (global)
        self._emitted = 0                      # samples emitted (global)
        self._acc: np.ndarray | None = None    # weighted stem accumulator
        self._wsum: np.ndarray | None = None   # weight accumulator
        self._acc_start = 0                    # global index of acc[..., 0]
        self._stat_sum = 0.0
        self._stat_sumsq = 0.0
        self._stat_n = 0

    # --- statistics -----------------------------------------------------

    def _update_stats(self, chunk: np.ndarray) -> None:
        if self._stats is not None or self._stat_n >= self._stats_n_target:
            return
        mono = chunk.mean(0)
        self._stat_sum += float(mono.sum())
        self._stat_sumsq += float(np.square(mono, dtype=np.float64).sum())
        self._stat_n += mono.shape[-1]

    def _mean_std(self) -> tuple[float, float]:
        if self._stats is not None:
            return self._stats
        n = max(self._stat_n, 2)
        mean = self._stat_sum / n
        var = max(self._stat_sumsq / n - mean * mean, 0.0) * n / (n - 1)
        return mean, max(np.sqrt(var), 1e-8)

    # --- core -----------------------------------------------------------

    def _total_buffered(self) -> int:
        return 0 if self._in is None else self._consumed + self._in.shape[-1]

    def _run_segment(self, seg_audio: np.ndarray,
                     left: int = 0) -> np.ndarray:
        """(C, clen) raw audio -> (S, C, segment) denormalized stems.

        Short tails are zero-padded AFTER normalization (the offline
        pipeline normalizes the track first and pads the segment batch
        with zeros — split_into_segments); denormalization commutes
        through the weighted overlap-add because it is affine and the
        weights are normalized by their own sum."""
        mean, std = self._mean_std()
        x = (seg_audio - mean) / std
        clen = x.shape[-1]
        if clen < self.segment:
            x = np.pad(x, ((0, 0), (left, self.segment - clen - left)))
        out = np.asarray(self._fn(self.params,
                                  jnp.asarray(x[None], jnp.float32)))[0]
        return out.astype(np.float32) * std + mean

    def _ensure_acc(self, upto: int) -> None:
        S, Cch = self.num_sources, self._in.shape[0]
        need = upto - self._acc_start
        if self._acc is None:
            self._acc = np.zeros((S, Cch, need), np.float64)
            self._wsum = np.zeros(need, np.float64)
        elif self._acc.shape[-1] < need:
            grow = need - self._acc.shape[-1]
            self._acc = np.concatenate(
                [self._acc, np.zeros((S, Cch, grow), np.float64)], -1)
            self._wsum = np.concatenate([self._wsum, np.zeros(grow)], -1)

    def _add_segment(self, off: int, stems: np.ndarray, clen: int,
                     left: int) -> None:
        self._ensure_acc(off + clen)
        a = off - self._acc_start
        w = self._weight[:clen]
        self._acc[:, :, a:a + clen] += w * stems[:, :, left:left + clen]
        self._wsum[a:a + clen] += w

    def _emit(self, upto: int) -> np.ndarray:
        """Return finalized stems in [self._emitted, upto)."""
        if upto <= self._emitted:
            return np.zeros((self.num_sources,
                             0 if self._in is None else self._in.shape[0],
                             0), np.float32)
        a = self._emitted - self._acc_start
        b = upto - self._acc_start
        out = (self._acc[:, :, a:b] /
               np.maximum(self._wsum[a:b], 1e-12)).astype(np.float32)
        # drop the emitted prefix from the accumulators
        self._acc = self._acc[:, :, b:]
        self._wsum = self._wsum[b:]
        self._acc_start = upto
        self._emitted = upto
        return out

    def push(self, chunk: np.ndarray) -> np.ndarray:
        """Feed (C, n) audio; returns newly finalized (S, C, m) stems."""
        chunk = np.atleast_2d(np.asarray(chunk, np.float32))
        self._update_stats(chunk)
        if self._in is None:
            self._in = chunk
        else:
            self._in = np.concatenate([self._in, chunk], -1)
        total = self._total_buffered()
        while self._next_off + self.segment <= total:
            local = self._next_off - self._consumed
            seg_audio = self._in[:, local:local + self.segment]
            stems = self._run_segment(seg_audio)
            self._add_segment(self._next_off, stems, self.segment, 0)
            self._next_off += self.stride
            # audio before the next segment's start is never read again
            drop = self._next_off - self._consumed
            if drop > 0:
                self._in = self._in[:, drop:]
                self._consumed = self._next_off
        # all samples before the next unprocessed offset are final
        return self._emit(min(self._next_off, total))

    def flush(self) -> np.ndarray:
        """Process the padded tail (offline split_into_segments
        semantics), emit everything left, reset."""
        total = self._total_buffered()
        if self._in is None or total == 0:
            return np.zeros((self.num_sources, 0, 0), np.float32)
        while self._next_off < total:
            local = self._next_off - self._consumed
            tail = self._in[:, local:local + self.segment]
            clen = tail.shape[-1]
            left = (self.segment - clen) // 2
            stems = self._run_segment(tail, left)
            self._add_segment(self._next_off, stems, clen, left)
            self._next_off += self.stride
        out = self._emit(total)
        self.reset()
        return out
