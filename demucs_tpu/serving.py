"""In-process serving API — the TPU analog of the reference's WASM port.

The reference exposes two C exports to JavaScript
(reference src_wasm/demucs.cpp:70-171): `modelInit(bytes)` loading a
ggml blob from memory, and `modelDemixSegment(L, R, len, outs...)`
separating one segment. Here the same contract is a Python class
suitable for embedding in a server: weights stay resident on device,
programs are compiled once per input length and cached, and progress
flows through the standard ProgressCallback hook.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from .config import HDemucsV3Config
from .models import hdemucs_v3_segment, htdemucs_segment
from .params.ggml import load_model_params
from .pipeline import ApplyOptions, Separator
from .utils.progress import ProgressCallback, null_progress


class DemixSession:
    """Resident separation session (reference `modelInit`,
    src_wasm/demucs.cpp:70-84)."""

    def __init__(self, model: str | Path | bytes, dtype=None):
        if dtype is None:
            # serving posture: bf16 on TPU (the measured-equal fast
            # path — CLAUDE.md perf history), f32 elsewhere
            dtype = (jnp.bfloat16
                     if jax.devices()[0].platform == "tpu" else np.float32)
        self.cfg, params = load_model_params(model, dtype=dtype)
        self.params = jax.tree.map(jnp.asarray, params)
        if isinstance(self.cfg, HDemucsV3Config):
            self._segment_fn = lambda p, m: hdemucs_v3_segment(p, m, self.cfg)
        else:
            self._segment_fn = lambda p, m: htdemucs_segment(p, m, self.cfg)
        self._jitted = jax.jit(self._segment_fn)  # one cache, keyed by shape
        self._separators: dict = {}  # ApplyOptions snapshot -> Separator

    @property
    def sources(self) -> tuple[str, ...]:
        return self.cfg.sources

    def demix_segment(self, left: np.ndarray, right: np.ndarray,
                      ) -> dict[str, tuple[np.ndarray, np.ndarray]]:
        """One segment, no overlap-add (reference `modelDemixSegment`,
        src_wasm/demucs.cpp:86-171): (L,), (R,) -> {stem: (L, R)}."""
        mix = jnp.asarray(np.stack([left, right])[None], jnp.float32)
        out = np.asarray(self._jitted(self.params, mix))[0]  # (S, 2, N)
        return {name: (out[i, 0], out[i, 1])
                for i, name in enumerate(self.cfg.sources)}

    def _separator(self, options: ApplyOptions | None) -> Separator:
        """One Separator (and one jax.jit cache) per distinct options —
        repeat demix_track calls reuse compiled programs."""
        import dataclasses

        opts = options or ApplyOptions()
        key = tuple(
            v if isinstance(v, (int, float, str, type(None), bool))
            else str(v)
            for v in dataclasses.astuple(opts))
        if key not in self._separators:
            self._separators[key] = Separator(
                self._segment_fn, self.params, self.cfg.num_sources, opts)
        return self._separators[key]

    def demix_track(self, audio: np.ndarray,
                    options: ApplyOptions | None = None,
                    progress: ProgressCallback = null_progress) -> np.ndarray:
        """Full track with overlap-add: (2, N) -> (S, 2, N)."""
        return self._separator(options)(audio, progress=progress)

    def export_program(self, batch_size: int = 8,
                       segment_samples: int | None = None) -> bytes:
        """AOT-export the segment graph as serialized StableHLO.

        The portable-artifact analog of the reference's WASM build
        (src_wasm/): the returned bytes deserialize and run on any JAX
        runtime with the same model params — no Python model code needed
        at the destination. See load_exported().
        """
        from jax import export as jexport

        from .config import SEGMENT_SAMPLES

        seg = segment_samples or SEGMENT_SAMPLES
        p_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.params)
        mix_abs = jax.ShapeDtypeStruct((batch_size, 2, seg), jnp.float32)
        exported = jexport.export(jax.jit(self._segment_fn))(p_abs, mix_abs)
        return bytes(exported.serialize())

    def export_track_program(self, track_samples: int,
                             batch_size: int = 8,
                             segment_samples: int | None = None) -> bytes:
        """AOT-export the FUSED whole-track program — split + segment
        graph + weighted overlap-add all ON DEVICE (the serving path) —
        as serialized StableHLO.

        The artifact maps (params, track (2, Lp) f32, n_true i32) ->
        (S, 2, Lp) stems of the NORMALIZED track, where
        Lp = ceil(track_samples / stride) * stride. It is exact for any
        true length n_true in (Lp - stride, Lp]; the caller's only host
        math is the affine normalize/denormalize by the track's mono
        mean/std, zero-padding up to Lp, and the final [:n_true] slice
        (pipeline.Separator._normalize_shift). The shift trick is
        disabled so the artifact is deterministic and self-contained.
        Counterpart of the reference WASM port's whole-pipeline deploy
        (src_wasm/demucs.cpp:86-171 runs demucs_inference end to end).
        """
        import math

        from jax import export as jexport

        opts = ApplyOptions(batch_size=batch_size, fused_track=True,
                            max_shift_secs=0.0, shift_offset=0,
                            ).with_segment(segment_samples)
        sep = self._separator(opts)
        o = sep.options
        stride = int((1 - o.overlap) * o.segment_samples)
        n_seg = max(1, math.ceil(track_samples / stride))
        Lp = n_seg * stride
        fn = sep._fused_track_fn(n_seg, Lp)
        p_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.params)
        x_abs = jax.ShapeDtypeStruct((2, Lp), jnp.float32)
        n_abs = jax.ShapeDtypeStruct((), jnp.int32)
        exported = jexport.export(fn)(p_abs, x_abs, n_abs)
        return bytes(exported.serialize())

    @staticmethod
    def load_exported(blob: bytes):
        """Deserialize an export_program() / export_track_program()
        artifact -> callable (params, ...) -> stems."""
        from jax import export as jexport

        return jexport.deserialize(blob).call

    def demix_tracks(self, tracks: list[np.ndarray],
                     options: ApplyOptions | None = None,
                     progress: ProgressCallback = null_progress
                     ) -> list[np.ndarray]:
        """Continuous batching across many tracks (one global segment
        batch; see pipeline.Separator.separate_many)."""
        return self._separator(options).separate_many(tracks, progress=progress)


class BagDemixSession(DemixSession):
    """Resident fine-tuned-ensemble session (reference premium config,
    cli-apps/demucs_ft.cpp:136-241): four htdemucs_ft_* weight files,
    per-stem selection, served through the same surface as
    DemixSession — so the HTTP server / feeder / streaming paths work
    for the ensemble unchanged. The device form is the unrolled
    one-program bag (the measured-fastest, docs/bag_forms_micro.py)."""

    def __init__(self, ft_dir: str | Path, dtype=None):
        from .cli import _find_ft_models
        from .models.bag import bag_select, stack_bag_params, \
            unrolled_model_map

        if dtype is None:
            dtype = (jnp.bfloat16
                     if jax.devices()[0].platform == "tpu" else np.float32)
        paths = _find_ft_models(Path(ft_dir))
        cfg = None
        trees = []
        for p in paths:
            c, t = load_model_params(p, dtype=dtype)
            cfg = cfg or c
            trees.append(t)
        self.cfg = cfg
        self.params = jax.tree.map(jnp.asarray, stack_bag_params(trees))
        single_fn = (hdemucs_v3_segment
                     if isinstance(cfg, HDemucsV3Config)
                     else htdemucs_segment)

        def bag_fn(p, m, _cfg=cfg):
            return bag_select(
                unrolled_model_map(lambda pi: single_fn(pi, m, _cfg), p))

        self._segment_fn = bag_fn
        self._jitted = jax.jit(bag_fn)
        self._separators = {}
