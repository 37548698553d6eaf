"""Full-track inference orchestration: normalize / shift / split / batch /
overlap-add.

Re-design of reference src/model_apply.cpp. The reference runs segments
sequentially through one set of buffers (src/model_apply.cpp:189) and
offers coarse parallelism by splitting the track across std::threads
(cli-apps/threaded_inference.hpp). Here, all segments of a track become
one batched device call (continuous batching); the cheap overlap-add
bookkeeping stays on the host in numpy. Multi-device data parallelism
shards the same batch axis (see parallel/).

Conventions preserved exactly (constants src/model.hpp:652-656):
  * 7.8 s segments, 25% overlap (stride = 0.75 * segment)
  * triangular transition weights ** TRANSITION_POWER
  * random shift in [0, 0.5 s) with symmetric zero padding; the
    reference pins offset=1337 samples for SDR comparisons
    (.github/SDR_scores.md:21) — pass shift_offset=1337 for parity
  * track-level mono-reference mean/std normalization
    (src/model_apply.cpp:64-90)
"""

from __future__ import annotations

import dataclasses
import math
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from . import config as C
from .utils.progress import ProgressCallback, null_progress


@dataclasses.dataclass
class ApplyOptions:
    segment_samples: int = C.SEGMENT_SAMPLES
    overlap: float = C.OVERLAP
    transition_power: float = C.TRANSITION_POWER
    max_shift_secs: float = C.MAX_SHIFT_SECS
    shift_offset: int | None = None   # None => derived from seed
    shift_seed: int = 1337
    batch_size: int = 8               # segments per device call
    dtype: np.dtype = np.float32
    # intra-segment stage progress (reference's 26 steps per segment,
    # src/model_inference.cpp:156-346) via jax.debug.callback markers;
    # off by default to keep the hot graph callback-free
    fine_progress: bool = False

    def with_segment(self, segment_samples: int | None) -> "ApplyOptions":
        """Copy with a shorter segment; the shift pad must stay well
        inside it (single source of the clamp rule — CLI/tools share it)."""
        if not segment_samples:
            return self
        return dataclasses.replace(
            self,
            segment_samples=segment_samples,
            max_shift_secs=min(self.max_shift_secs,
                               segment_samples / C.SAMPLE_RATE / 4))


def triangle_weight(segment: int, power: float = 1.0) -> np.ndarray:
    """Reference split_inference weights (src/model_apply.cpp:171-179)."""
    half = segment // 2
    w = np.concatenate([
        np.linspace(1, half, half, dtype=np.float64),
        np.linspace(1, half, half, dtype=np.float64)[::-1],
    ])
    if segment % 2:  # odd segments: center sample gets max weight
        w = np.concatenate([w[:half], [half], w[half:]])
    w = w / w.max()
    return (w ** power).astype(np.float32)


def _segment_offsets(length: int, stride: int) -> list[int]:
    return list(range(0, length, stride))


def split_into_segments(audio: np.ndarray, segment: int, stride: int):
    """(C, N) -> (num_segments, C, segment) with symmetric zero padding of
    short tails (reference segment_inference, src/model_apply.cpp:250-288).

    Returns (batch, per-segment (offset, chunk_length, left_pad)).
    """
    C_, N = audio.shape
    offsets = _segment_offsets(N, stride)
    batch = np.zeros((len(offsets), C_, segment), audio.dtype)
    meta = []
    for i, off in enumerate(offsets):
        chunk = audio[:, off:off + segment]
        clen = chunk.shape[-1]
        total_pad = segment - clen
        left = total_pad // 2
        batch[i, :, left:left + clen] = chunk
        meta.append((off, clen, left))
    return batch, meta


def overlap_add(chunks: np.ndarray, meta, length: int, segment: int,
                weight: np.ndarray) -> np.ndarray:
    """Weighted recombination (reference src/model_apply.cpp:200-246).

    chunks: (num_segments, S, C, segment) — still symmetric-padded.
    """
    S, Cch = chunks.shape[1], chunks.shape[2]
    out = np.zeros((S, Cch, length), np.float64)
    sum_w = np.zeros(length, np.float64)
    for (off, clen, left), chunk in zip(meta, chunks):
        trimmed = chunk[:, :, left:left + clen]
        w = weight[:clen]
        end = min(off + clen, length)
        n = end - off
        out[:, :, off:end] += w[None, None, :n] * trimmed[:, :, :n]
        sum_w[off:end] += w[:n]
    return (out / sum_w[None, None, :]).astype(np.float32)


class Separator:
    """Compiled, batched track separator for one model family.

    model_fn(params, mix_batch) -> (B, S, C, L); compiled once per
    batch shape and reused across tracks (weights stay on device).
    """

    def __init__(self, model_fn: Callable, params, num_sources: int,
                 options: ApplyOptions | None = None,
                 jit: bool = True):
        self.options = options or ApplyOptions()
        self.num_sources = num_sources
        if jit:
            self.params = jax.tree.map(jnp.asarray, params)
            if self.options.fine_progress:
                from .utils.progress import stage_tracing

                def traced(p, m):
                    # the wrapper body runs at trace time, so the stage
                    # markers are compiled in; the sink is bound per call
                    with stage_tracing():
                        return model_fn(p, m)

                self._fn = jax.jit(traced)
            else:
                self._fn = jax.jit(model_fn)
        else:  # host-side model (e.g. the torch oracle, tools/torch_inference)
            self.params = params
            self._fn = model_fn

    def _call_device(self, chunk):
        """One device step with a single retry on transient runtime
        failures (tunneled TPU backends occasionally surface
        FAILED_PRECONDITION when the device resets between processes)."""
        try:
            return np.asarray(self._fn(self.params, chunk))
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - device
            if "FAILED_PRECONDITION" not in str(e):
                raise
            import time
            time.sleep(2.0)
            return np.asarray(self._fn(self.params, chunk))

    def _run_batched(self, batch: np.ndarray,
                     progress: ProgressCallback) -> np.ndarray:
        bs = self.options.batch_size
        n = batch.shape[0]
        outs = []
        padded_n = math.ceil(n / bs) * bs
        n_calls = padded_n // bs
        if padded_n != n:
            batch = np.concatenate(
                [batch, np.zeros((padded_n - n,) + batch.shape[1:], batch.dtype)])
        for i in range(0, padded_n, bs):
            if self.options.fine_progress:
                from .utils.progress import stage_sink
                done = i // bs

                def to_global(frac, msg, _done=done):
                    progress((_done + frac) / n_calls, msg)

                with stage_sink(to_global):
                    outs.append(self._call_device(jnp.asarray(batch[i:i + bs])))
            else:
                outs.append(self._call_device(jnp.asarray(batch[i:i + bs])))
            progress(min((i + bs) / padded_n, 1.0),
                     f"segments {min(i + bs, n)}/{n}")
        return np.concatenate(outs)[:n]

    def _prepare(self, audio: np.ndarray, progress: ProgressCallback):
        """normalize + shift + split one track -> (segment batch, state)."""
        o = self.options
        N = audio.shape[-1]

        # --- track normalization (mono-reference, unbiased std)
        ref = audio.mean(0)
        ref_mean = ref.mean()
        ref_std = ref.std(ddof=1)
        normalized = (audio - ref_mean) / max(ref_std, 1e-8)

        # --- shift trick
        max_shift = int(o.max_shift_secs * C.SAMPLE_RATE)
        if o.shift_offset is not None:
            offset = o.shift_offset
        elif max_shift == 0:  # max_shift_secs=0 means "no shift"
            offset = 0
        else:
            offset = np.random.default_rng(o.shift_seed).integers(0, max_shift)
        offset = int(offset)
        padded = np.zeros((audio.shape[0], N + 2 * max_shift), o.dtype)
        padded[:, max_shift:max_shift + N] = normalized
        shifted = padded[:, offset:]  # length N + 2*max_shift - offset
        shifted = shifted[:, :N + max_shift - offset]
        progress(0.0, f"apply model w/ shift, offset: {offset}")

        segment = o.segment_samples
        stride = int((1 - o.overlap) * segment)
        batch, meta = split_into_segments(shifted, segment, stride)
        state = (meta, shifted.shape[-1], max_shift, offset, N,
                 ref_mean, ref_std)
        return batch, state

    def _finish(self, chunk_out: np.ndarray, state) -> np.ndarray:
        """overlap-add + un-shift + denormalize one track."""
        o = self.options
        meta, shifted_len, max_shift, offset, N, ref_mean, ref_std = state
        segment = o.segment_samples
        combined = overlap_add(chunk_out, meta, shifted_len, segment,
                               triangle_weight(segment, o.transition_power))
        out = combined[:, :, max_shift - offset:max_shift - offset + N]
        return out * ref_std + ref_mean

    def __call__(self, audio: np.ndarray,
                 progress: ProgressCallback = null_progress) -> np.ndarray:
        """(C, N) float32 -> (S, C, N) float32."""
        batch, state = self._prepare(audio, progress)
        chunk_out = self._run_batched(batch, progress)
        return self._finish(chunk_out, state)

    def separate_many(self, tracks: list[np.ndarray],
                      progress: ProgressCallback = null_progress
                      ) -> list[np.ndarray]:
        """Continuous batching across tracks: every track's segments join
        ONE global batch, so short tracks never waste device steps — the
        multi-track analog of the reference's per-track threading
        (cli-apps/threaded_inference.hpp), with no crossfade seams.
        """
        batches, states = [], []
        for tr in tracks:
            b, s = self._prepare(tr, null_progress)
            batches.append(b)
            states.append(s)
        flat = np.concatenate(batches)
        out = self._run_batched(flat, progress)
        results, pos = [], 0
        for b, s in zip(batches, states):
            results.append(self._finish(out[pos:pos + len(b)], s))
            pos += len(b)
        return results


class SequentialBagSeparator(Separator):
    """htdemucs_ft BagOfModels as 4 sequential calls of ONE compiled
    program, params swapped per call (the reference's shape,
    cli-apps/demucs_ft.cpp:221-241 — but batched).

    Measured on a v5e chip: 147.2 audio-s/s vs 129.5 for the vmapped
    one-program bag (models/bag.py) — sequential hits the ideal
    single-model-rate/4 exactly, while vmap pays ~12% in grouped-conv
    layout overhead. vmap remains the right form for the multi-device
    `bag` mesh axis (parallel/separator.py:make_bag_fn).
    """

    def __init__(self, model_fn: Callable, param_trees: list,
                 num_sources: int, options: ApplyOptions | None = None):
        # upload each tree exactly once and hand tree 0 to the base
        # class (a second jnp.asarray of tree 0 there would pin a full
        # duplicate model in HBM until the first _call_device)
        self._trees = [jax.tree.map(jnp.asarray, t) for t in param_trees]
        super().__init__(model_fn, self._trees[0], num_sources, options)

    def _call_device(self, chunk):
        outs = []
        for i, tree in enumerate(self._trees):
            self.params = tree
            # model i contributes stem i only (the ft convention)
            outs.append(super()._call_device(chunk)[:, i])
        return np.stack(outs, axis=1)
