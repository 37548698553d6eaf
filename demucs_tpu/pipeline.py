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
    # Encode stems to int16 ON DEVICE before the device->host fetch:
    # halves the dominant transfer on slow host links (the tunneled-TPU
    # serving path moves 88 MB of f32 stems per batch-8 step at
    # ~34 MB/s). Quantization step in the normalized domain is
    # 4/32767 ~ 1.2e-4 (~69 dB below a 0.1-rms stem, far under the
    # model's ~8 dB separation SDR); the CLI's WAV output is PCM16
    # anyway. Off by default: f32 transfers stay bit-exact.
    transfer_int16: bool = False
    # Max device calls in flight: each fetch of result i may have up to
    # (depth - 1) later steps already dispatched, so compute overlaps
    # the (often slower) host transfers; 1 = strictly serial. Measured
    # on the tunneled TPU (int16, 4x30 s tracks): depth 2 = 13.4
    # audio-s/s is the knee — deeper queues contend with the fetch
    # (depth 3 = 12.1, depth 4 = 11.8). Default 2.
    pipeline_depth: int = 2
    # Route __call__/demix through separate_fused: split + segment
    # graph + weighted overlap-add all ON DEVICE, one upload and one
    # stem download per track (the minimum host-link bytes). One
    # compile per (n_segments, padded_length) bucket — best for
    # serving at fixed/bucketed track lengths.
    fused_track: bool = False
    # Compile-bucket granularity for fused_track. The fused program is
    # EXACT for any true length inside its bucket (the tail segments
    # take the true length as a traced scalar and reproduce the offline
    # symmetric padding), so coarser buckets trade ≤ ~25% wasted
    # compute on zero tail segments for exponentially fewer compiles:
    #   "exact": one bucket per segment count (minimum compute; a new
    #            compile for every distinct track length class)
    #   "geo":   segment counts snapped up a ~1.25x geometric grid
    #            (log-many compiles over all track lengths — the
    #            server default; see tools/serve.py --precompile)
    fused_buckets: str = "exact"
    # Device sub-batch inside the fused whole-track program (the
    # lax.map group size). None = auto: 2 on a single device (the r5
    # measured optimum — the whole fused 30 s-track program runs 50.3
    # vs 69.1 ms/track at sub-batch 8, +37%, because below batch ~4 the
    # per-layer activations stay VMEM-resident; same mechanism as the
    # batch-1 headline, docs/PROFILE_r5.md §3a), batch_size on mesh
    # separators (the sub-batch must cover the dp axis or every
    # lax.map call pads to a dp multiple). Transfers are unaffected
    # (still one upload/download per track).
    fused_sub_batch: int | None = None

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


# int16 transfer scale: 8.0 of headroom in the normalized track domain
# (the normalized mix has unit std; music stems peak at a few sigma, so
# 8 sigma practically never clips while the quantization step stays
# 8/32767 = 2.4e-4 — about -64 dB under a 0.1-rms stem, far below the
# model's separation SDR and the final PCM16 WAV's own grid)
PCM16_TRANSFER_SCALE = 32767.0 / 8.0


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
        import collections

        self.options = options or ApplyOptions()
        self.num_sources = num_sources
        self._model_fn = model_fn       # raw (pre-wrap), for the fused path
        self._fused_cache: dict = collections.OrderedDict()
        # LRU cap on compiled fused-track programs (None = unbounded;
        # servers facing arbitrary upload lengths should set one —
        # tools/serve.py caps it at 8 geo buckets)
        self.fused_cache_limit: int | None = None
        o = self.options
        if not jit and (o.transfer_int16 or o.fused_track):
            raise ValueError(
                "transfer_int16/fused_track are device-path options; the "
                "jit=False (host-model) separator would silently ignore "
                "transfer_int16 and cannot jit a host fn for fused_track")
        if o.fused_track and o.fine_progress:
            raise ValueError(
                "fused_track compiles the whole track into one program — "
                "the intra-segment fine_progress stages cannot be "
                "reported per batch; choose one")
        if jit:
            self.params = jax.tree.map(jnp.asarray, params)
            if self.options.transfer_int16:
                inner_fn = model_fn

                def model_fn(p, m):
                    out = inner_fn(p, m).astype(jnp.float32)
                    q = jnp.round(out * PCM16_TRANSFER_SCALE)
                    return jnp.clip(q, -32768.0, 32767.0).astype(jnp.int16)

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

    def _place(self, host: np.ndarray):
        """Upload one host batch (ShardedSeparator places on a mesh)."""
        return jnp.asarray(host)

    def _postfetch(self, arr: np.ndarray) -> np.ndarray:
        if arr.dtype == np.int16:  # transfer_int16 epilogue
            return arr.astype(np.float32) / PCM16_TRANSFER_SCALE
        return arr

    def _dispatch_device(self, chunk):
        """Enqueue one device step (async — returns device array(s))."""
        return self._fn(self.params, chunk)

    def _fetch_device(self, dev, redispatch) -> np.ndarray:
        """Blocking fetch with a single retry on transient runtime
        failures (tunneled TPU backends occasionally surface
        FAILED_PRECONDITION when the device resets between processes).
        `redispatch()` re-enqueues the step for the retry."""
        try:
            return self._postfetch(np.asarray(dev))
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - device
            if "FAILED_PRECONDITION" not in str(e):
                raise
            import time
            time.sleep(2.0)
            return self._postfetch(np.asarray(redispatch()))

    def _call_device(self, chunk) -> np.ndarray:
        return self._fetch_device(self._dispatch_device(chunk),
                                  lambda: self._dispatch_device(chunk))

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

        if self.options.fine_progress:
            # serial path: stage markers must attribute to the right call
            from .utils.progress import stage_sink
            for i in range(0, padded_n, bs):
                done = i // bs

                def to_global(frac, msg, _done=done):
                    progress((_done + frac) / n_calls, msg)

                with stage_sink(to_global):
                    outs.append(self._call_device(self._place(batch[i:i + bs])))
                progress(min((i + bs) / padded_n, 1.0),
                         f"segments {min(i + bs, n)}/{n}")
            return np.concatenate(outs)[:n]

        # pipelined path: keep up to pipeline_depth dispatched steps in
        # flight so device compute overlaps the (often slower) host
        # transfers; dispatch is async, only the fetch blocks.
        from collections import deque
        depth = max(1, self.options.pipeline_depth)
        inflight: deque = deque()

        def drain_one():
            placed, dev = inflight.popleft()
            outs.append(self._fetch_device(
                dev, lambda _p=placed: self._dispatch_device(_p)))
            done = min(len(outs) * bs, n)
            progress(len(outs) / n_calls, f"segments {done}/{n}")

        for i in range(0, padded_n, bs):
            placed = self._place(batch[i:i + bs])
            inflight.append((placed, self._dispatch_device(placed)))
            # depth = max steps in flight: depth 1 fetches each result
            # before the next dispatch (true serial, the default)
            if len(inflight) >= depth:
                drain_one()
        while inflight:
            drain_one()
        return np.concatenate(outs)[:n]

    def _normalize_shift(self, audio: np.ndarray, progress: ProgressCallback):
        """normalize + shift one track -> (shifted, (max_shift, offset,
        N, ref_mean, ref_std))."""
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
        return shifted, (max_shift, offset, N, ref_mean, ref_std)

    def _prepare(self, audio: np.ndarray, progress: ProgressCallback):
        """normalize + shift + split one track -> (segment batch, state)."""
        o = self.options
        shifted, (max_shift, offset, N, ref_mean, ref_std) = \
            self._normalize_shift(audio, progress)
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

    # --- fused whole-track path -----------------------------------------
    # The reference streams segments through host buffers
    # (src/model_apply.cpp:189); the batched path above keeps that
    # host/device split. The fused path instead compiles split +
    # segment graph + weighted overlap-add into ONE device program, so
    # exactly one (C, L) upload and one (S, C, L) stem download cross
    # the host link per track — the transfer-bound serving optimum
    # (the tunneled-TPU link moves only ~34 MB/s).

    def _fused_track_fn(self, n_seg: int, length: int,
                        min_n: int | None = None):
        """One compiled whole-track program per (n_seg, padded-length)
        bucket. EXACT for any true track length n_true in
        (min_n - 1, length]: the tail segments take n_true as a traced
        scalar and reproduce split_into_segments' symmetric padding by
        rotating the zero-padded raw slice into place (all samples past
        the true length are zeros, so the rotation IS the symmetric
        pad), then rotate the stems back and mask the overlap-add
        weights to the true chunk length. Segments that are full for
        every length in the bucket compile on the static fast path."""
        if min_n is None:  # exact-snap bucket: n_true in (length-stride, length]
            min_n = length - int((1 - self.options.overlap)
                                 * self.options.segment_samples) + 1
        key = (n_seg, length, min_n)
        fn = self._fused_cache.get(key)
        if fn is not None:
            self._fused_cache.move_to_end(key)
            return fn
        o = self.options
        seg = o.segment_samples
        stride = int((1 - o.overlap) * seg)
        offs = list(range(0, length, stride))
        assert len(offs) == n_seg, (len(offs), n_seg)
        w_full = triangle_weight(seg, o.transition_power)
        # static segments: fully inside every possible true length of
        # this bucket — no roll, full weight (compile-time constants)
        is_dyn = [off + seg > min_n for off in offs]
        ext = offs[-1] + seg  # accumulator length (last segment overhangs)
        sum_w_static = np.zeros(ext, np.float64)
        for off, dyn in zip(offs, is_dyn):
            if not dyn:
                sum_w_static[off:off + seg] += w_full
        int16 = o.transfer_int16
        model = self._fused_model_call  # hook: mesh subclasses shard it

        # device sub-batch (see ApplyOptions.fused_sub_batch): small
        # groups keep activations VMEM-resident; lax.map runs
        # ceil(n/bs) sub-batches through ONE compiled body
        bs = max(1, o.fused_sub_batch or self._fused_auto_sub())
        n_groups = -(-n_seg // bs)

        def fused(params, shifted, n_true):
            x = shifted
            if x.dtype == jnp.int16:
                x = x.astype(jnp.float32) / PCM16_TRANSFER_SCALE
            clens = {off: jnp.clip(n_true - off, 0, seg) for off in offs}
            chunks = []
            for off, dyn in zip(offs, is_dyn):
                hi = min(off + seg, length)
                c = jax.lax.slice_in_dim(x, off, hi, axis=1)
                if hi - off < seg:  # raw slice overhangs the upload pad
                    c = jnp.pad(c, ((0, 0), (0, seg - (hi - off))))
                if dyn:
                    # left-rotate zeros in front of the chunk: equals
                    # the offline symmetric zero pad because x is zero
                    # past n_true
                    left = (seg - clens[off]) // 2
                    c = jnp.roll(c, left, axis=-1)
                chunks.append(c)
            batch = jnp.stack(chunks)                     # (n, C, seg)
            if n_groups == 1:
                out = model(params, batch)                # (n, S, C, seg)
            else:
                pad_n = n_groups * bs - n_seg
                if pad_n:
                    batch = jnp.pad(batch, ((0, pad_n), (0, 0), (0, 0)))
                grouped = batch.reshape(n_groups, bs, *batch.shape[1:])
                out = jax.lax.map(lambda g: model(params, g), grouped)
                out = out.reshape(n_groups * bs, *out.shape[2:])[:n_seg]
            out = out.astype(jnp.float32)
            w = jnp.asarray(w_full)
            pos = jnp.arange(seg)
            y = jnp.zeros(out.shape[1:3] + (ext,), jnp.float32)
            wsum = jnp.asarray(sum_w_static.astype(np.float32))
            for i, (off, dyn) in enumerate(zip(offs, is_dyn)):
                oi = out[i]
                if dyn:
                    clen = clens[off]
                    left = (seg - clen) // 2
                    oi = jnp.roll(oi, -left, axis=-1)
                    wm = w * (pos < clen)
                    wsum = wsum.at[off:off + seg].add(wm)
                else:
                    wm = w
                y = y.at[:, :, off:off + seg].add(wm * oi)
            y = y[:, :, :length] / jnp.maximum(wsum[:length], 1e-12)
            if int16:
                q = jnp.round(y * PCM16_TRANSFER_SCALE)
                return jnp.clip(q, -32768.0, 32767.0).astype(jnp.int16)
            return y

        fn = jax.jit(fused)
        self._fused_cache[key] = fn
        if (self.fused_cache_limit is not None
                and len(self._fused_cache) > self.fused_cache_limit):
            self._fused_cache.popitem(last=False)
        return fn

    def _fused_auto_sub(self) -> int:
        """Auto device sub-batch for the fused program: 2 on a single
        device (measured optimum, docs/PROFILE_r5.md); mesh separators
        override with their dp-covering batch_size."""
        return max(1, min(2, self.options.batch_size))

    def _fused_model_call(self, params, batch):
        """Model invocation inside the fused whole-track program.
        ShardedSeparator overrides this to dp-shard the segment batch
        over its mesh (with_sharding_constraint) so one track's fused
        program still uses every chip."""
        return self._model_fn(params, batch)

    def _place_track(self, up: np.ndarray):
        """Upload the whole-track buffer for the fused program
        (mesh subclasses replicate it over their devices)."""
        return jnp.asarray(up)

    def _bucket_nseg(self, n_seg_true: int) -> tuple[int, int]:
        """Snap a true segment count up to its compile bucket.
        Returns (bucket_n_seg, previous_bucket_n_seg)."""
        if self.options.fused_buckets == "exact":
            return n_seg_true, n_seg_true - 1
        if self.options.fused_buckets != "geo":
            raise ValueError(
                f"unknown fused_buckets {self.options.fused_buckets!r}"
                " (choices: 'exact', 'geo')")
        b, prev = 1, 0
        while b < n_seg_true:
            prev, b = b, max(b + 1, math.ceil(b * 1.25))
        return b, prev

    def _fused_prepare(self, audio: np.ndarray,
                       progress: ProgressCallback = null_progress):
        """Prep one track for the fused program: normalize/shift/pad,
        optional int16 encode, upload. Returns (fn, placed, n_true,
        state); the program is fn(params, placed, n_true)."""
        o = self.options
        shifted, (max_shift, offset, N, ref_mean, ref_std) = \
            self._normalize_shift(audio, progress)
        seg = o.segment_samples
        stride = int((1 - o.overlap) * seg)
        n_true = shifted.shape[-1]
        # snap the segment count up to its compile bucket; the program
        # is exact for any n_true inside the bucket (traced tail)
        n_seg, prev_b = self._bucket_nseg(math.ceil(n_true / stride))
        Lp = n_seg * stride
        if Lp != n_true:
            shifted = np.pad(shifted, ((0, 0), (0, Lp - n_true)))
        fn = self._fused_track_fn(n_seg, Lp, min_n=prev_b * stride + 1)

        up = shifted
        if o.transfer_int16:
            up = np.clip(np.round(shifted * PCM16_TRANSFER_SCALE),
                         -32768, 32767).astype(np.int16)
        placed = self._place_track(up)
        return (fn, placed, jnp.int32(n_true),
                (n_seg, max_shift, offset, N, ref_mean, ref_std))

    def warmup(self, lengths_samples) -> None:
        """Pre-compile (and pre-execute once) the fused buckets for the
        given track lengths, so a cold server's first request never
        pays the multi-minute tunnel compile. No-op overlap with
        already-compiled buckets (same bucket -> same cached program)."""
        for L in lengths_samples:
            self.separate_fused(np.zeros((2, int(L)), np.float32))

    def _fused_dispatch(self, audio: np.ndarray,
                        progress: ProgressCallback = null_progress):
        """Prep + async-dispatch one track's fused program; returns
        (device_out, redispatch, finish_state)."""
        fn, placed, n_true, state = self._fused_prepare(audio, progress)
        return (fn(self.params, placed, n_true),
                lambda: fn(self.params, placed, n_true),
                state)

    def _fused_collect(self, dev, redispatch, state,
                       progress: ProgressCallback = null_progress
                       ) -> np.ndarray:
        n_seg, max_shift, offset, N, ref_mean, ref_std = state
        # explicit base-class fetch: subclasses specialize _fetch_device
        # for their *batched* dispatch shape (e.g. the bag's list of
        # per-model outputs); the fused program returns one array
        y = Separator._fetch_device(self, dev, redispatch)
        progress(1.0, f"segments {n_seg}/{n_seg}")
        out = y[:, :, max_shift - offset:max_shift - offset + N]
        return out * ref_std + ref_mean

    def separate_fused(self, audio: np.ndarray,
                       progress: ProgressCallback = null_progress
                       ) -> np.ndarray:
        """(C, N) -> (S, C, N) via ONE device call for the whole track."""
        dev, redispatch, state = self._fused_dispatch(audio, progress)
        return self._fused_collect(dev, redispatch, state, progress)

    def __call__(self, audio: np.ndarray,
                 progress: ProgressCallback = null_progress) -> np.ndarray:
        """(C, N) float32 -> (S, C, N) float32."""
        if self.options.fused_track:
            return self.separate_fused(audio, progress)
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
        if self.options.fused_track:
            # per-track fused calls; same segment-count bucket -> same
            # compiled program, and each track is one up/down transfer.
            # Subclasses that override separate_fused (the sequential
            # bag) keep the simple loop; the base pipelines track k+1's
            # prep+dispatch behind track k's fetch (pipeline_depth).
            outs = []
            if type(self).separate_fused is not Separator.separate_fused:
                for k, tr in enumerate(tracks):
                    outs.append(self.separate_fused(tr))
                    progress((k + 1) / len(tracks),
                             f"tracks {k + 1}/{len(tracks)}")
                return outs
            from collections import deque
            depth = max(1, self.options.pipeline_depth)
            inflight: deque = deque()

            def drain_one():
                outs.append(self._fused_collect(*inflight.popleft()))
                progress(len(outs) / len(tracks),
                         f"tracks {len(outs)}/{len(tracks)}")

            for tr in tracks:
                inflight.append(self._fused_dispatch(tr))
                if len(inflight) >= depth:
                    drain_one()
            while inflight:
                drain_one()
            return outs
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

    r4 status: superseded as the single-device default by the UNROLLED
    one-program bag (models/bag.py:unrolled_model_map — 193.3 vs 187.7
    audio-s/s here, docs/bag_forms_micro.py; vmap trails at 161.2 on
    grouped-conv layout overhead). Kept for (a) the 4x-smaller compiled
    program when compile latency matters more than 3% throughput, and
    (b) its fused form's per-model dispatch overlap on very slow host
    links.
    """

    def __init__(self, model_fn: Callable, param_trees: list,
                 num_sources: int, options: ApplyOptions | None = None):
        # upload each tree exactly once and hand tree 0 to the base
        # class (a second jnp.asarray of tree 0 there would pin a full
        # duplicate model in HBM until the first _call_device)
        self._trees = [jax.tree.map(jnp.asarray, t) for t in param_trees]
        super().__init__(model_fn, self._trees[0], num_sources, options)

    def separate_fused(self, audio: np.ndarray,
                       progress: ProgressCallback = null_progress
                       ) -> np.ndarray:
        """Fused whole-track ft bag: ONE input upload shared by all
        ensemble models, all model programs dispatched up front (the
        later models' compute overlaps the earlier fetches), and only
        stem i of model i crosses the host link (device-side slice —
        1/S of the stem download vs running each model standalone)."""
        fn, placed, n_true, state = self._fused_prepare(audio, progress)
        n_seg, max_shift, offset, N, ref_mean, ref_std = state
        devs = [fn(tree, placed, n_true)[i]
                for i, tree in enumerate(self._trees)]
        outs = []
        for i, (tree, dev) in enumerate(zip(self._trees, devs)):
            y = Separator._fetch_device(
                self, dev,
                lambda _t=tree, _i=i: fn(_t, placed, n_true)[_i])
            outs.append(y)
            progress((i + 1) / len(self._trees),
                     f"model {i + 1}/{len(self._trees)}")
        out = np.stack(outs)[:, :, max_shift - offset:max_shift - offset + N]
        return out * ref_std + ref_mean

    def _dispatch_device(self, chunk):
        # pure read of the tree list — no instance-state mutation, so
        # concurrent dispatches (a threaded server) stay correct
        return [self._fn(tree, chunk) for tree in self._trees]

    def _fetch_device(self, devs, redispatch) -> np.ndarray:
        def gather(ds):
            # model i contributes stem i only (the ft convention)
            return np.stack([self._postfetch(np.asarray(d))[:, i]
                             for i, d in enumerate(ds)], axis=1)

        try:
            return gather(devs)
        except jax.errors.JaxRuntimeError as e:  # pragma: no cover - device
            if "FAILED_PRECONDITION" not in str(e):
                raise
            import time
            time.sleep(2.0)
            return gather(redispatch())
