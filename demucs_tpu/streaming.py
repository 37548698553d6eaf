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
                 stats_seconds: float = 10.0,
                 dtype=None, max_batch: int = 8,
                 run_batch: Callable | None = None):
        """dtype: weight/compute dtype; default bf16 on TPU (the
        serving posture DemixSession uses — CLAUDE.md perf history:
        measured equal-throughput, half the HBM), f32 elsewhere.
        max_batch: ready segments per device call — a push spanning
        several strides (and every flush) batches its segments into
        one call instead of one call each (≈ the offline batched rate
        instead of the batch-1 rate).
        run_batch: optional (n, C, seg) f32 -> (n, S, C, seg) f32
        device hook. When set, model_fn/params/dtype are unused and
        this instance holds NO device state — the server passes a
        service.DeviceFeeder bound method here so many concurrent
        streams (and /separate requests) share batched device calls."""
        if run_batch is not None:
            self._run_batch = run_batch
            self._fn = None
            self.params = None
        else:
            self._run_batch = None
            if dtype is None:
                dtype = (jnp.bfloat16
                         if jax.devices()[0].platform == "tpu"
                         else jnp.float32)
            self._fn = jax.jit(model_fn)
            self.params = jax.tree.map(
                lambda x: jnp.asarray(x, dtype)
                if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
                else jnp.asarray(x), params)
        self.num_sources = num_sources
        self.segment = int(segment_samples)
        self.stride = int((1 - overlap) * self.segment)
        self.max_batch = int(max_batch)
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

    def _run_segments(self, segs: list[tuple[np.ndarray, int]]) -> np.ndarray:
        """[((C, clen) raw audio, left_pad), ...] -> (n, S, C, segment)
        denormalized stems — ONE device call per max_batch group (a
        push spanning several strides and every flush have multiple
        ready segments; running them batched recovers the offline
        batched rate instead of the batch-1 rate).

        Short tails are zero-padded AFTER normalization (the offline
        pipeline normalizes the track first and pads the segment batch
        with zeros — split_into_segments); denormalization commutes
        through the weighted overlap-add because it is affine and the
        weights are normalized by their own sum."""
        mean, std = self._mean_std()
        n = len(segs)
        Cch = segs[0][0].shape[0]
        batch = np.zeros((n, Cch, self.segment), np.float32)
        for i, (raw, left) in enumerate(segs):
            x = (raw - mean) / std
            batch[i, :, left:left + x.shape[-1]] = x
        if self._run_batch is not None:
            out = np.asarray(self._run_batch(batch)).astype(np.float32)
            return out * std + mean
        outs = []
        for i in range(0, n, self.max_batch):
            chunk = batch[i:i + self.max_batch]
            b = chunk.shape[0]
            # pad to a power-of-two bucket: at most log2(max_batch)+1
            # compiled programs ever exist
            bb = 1 << (b - 1).bit_length()
            if bb != b:
                chunk = np.concatenate(
                    [chunk, np.zeros((bb - b, Cch, self.segment),
                                     np.float32)])
            out = np.asarray(self._fn(self.params, jnp.asarray(chunk)))[:b]
            outs.append(out.astype(np.float32))
        return np.concatenate(outs) * std + mean

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
        # collect every ready segment first, run them as ONE batched
        # device call (per max_batch group), then overlap-add
        ready: list[tuple[int, np.ndarray]] = []
        while self._next_off + self.segment <= total:
            local = self._next_off - self._consumed
            ready.append((self._next_off,
                          self._in[:, local:local + self.segment]))
            self._next_off += self.stride
        if ready:
            stems = self._run_segments([(seg, 0) for _, seg in ready])
            for (off, _), out in zip(ready, stems):
                self._add_segment(off, out, self.segment, 0)
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
        tails: list[tuple[int, np.ndarray, int, int]] = []
        while self._next_off < total:
            local = self._next_off - self._consumed
            tail = self._in[:, local:local + self.segment]
            clen = tail.shape[-1]
            tails.append((self._next_off, tail, clen,
                          (self.segment - clen) // 2))
            self._next_off += self.stride
        if tails:
            stems = self._run_segments(
                [(tail, left) for _, tail, _, left in tails])
            for (off, _, clen, left), out in zip(tails, stems):
                self._add_segment(off, out, clen, left)
        out = self._emit(total)
        self.reset()
        return out
