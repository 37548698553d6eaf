"""Training data pipeline: segment sampling + on-device augmentation.

The reference is inference-only; this mirrors the upstream
facebookresearch/demucs trainer's data path (demucs/augment.py,
demucs/wav.py) that produced its checkpoints:

  * host side: sample random fixed-length segments from per-track stem
    arrays (the MUSDB layout: one (S, C, N) array per track);
  * device side: the classic augmentation set as a pure jittable
    function — channel flip, sign flip per source, per-source gain in
    [0.75, 1.25], and Remix (shuffle each source across the batch) —
    so augmentation fuses into the training step instead of burning
    host cycles;
  * the mix is re-synthesized as the sum of augmented stems (upstream
    convention: the model always trains against self-consistent
    mix/stem pairs).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


def augment_stems(key: jax.Array, stems: jnp.ndarray,
                  scale_min: float = 0.75, scale_max: float = 1.25,
                  remix: bool = True) -> jnp.ndarray:
    """(B, S, C, T) -> (B, S, C, T), jit-able (upstream demucs/augment.py).

    Per (batch, source): random stereo channel flip, random sign flip,
    random gain in [scale_min, scale_max]; then Remix draws each
    source's row from a random permutation of the batch (sources stay
    aligned in time only within themselves — the mix must be
    re-synthesized as the sum afterwards).
    """
    B, S, Cch, T = stems.shape
    k_flip, k_sign, k_scale, k_remix = jax.random.split(key, 4)

    flip = jax.random.bernoulli(k_flip, 0.5, (B, S))         # channel swap
    flipped = stems[:, :, ::-1, :]
    stems = jnp.where(flip[:, :, None, None], flipped, stems)

    sign = jax.random.rademacher(k_sign, (B, S), dtype=stems.dtype)
    stems = stems * sign[:, :, None, None]

    scale = jax.random.uniform(k_scale, (B, S), stems.dtype,
                               scale_min, scale_max)
    stems = stems * scale[:, :, None, None]

    if remix and B > 1:
        # independent batch permutation per source
        perms = jnp.stack(
            [jax.random.permutation(k, B)
             for k in jax.random.split(k_remix, S)], axis=1)  # (B, S)
        stems = jnp.take_along_axis(stems, perms[:, :, None, None], axis=0)
    return stems


def mix_from_stems(stems: jnp.ndarray) -> jnp.ndarray:
    """(B, S, C, T) -> (B, C, T): the self-consistent training mix."""
    return stems.sum(axis=1)


class SegmentSampler:
    """Random fixed-length segment batches from per-track stem arrays.

    tracks: list of (S, C, N) float32 arrays (one per training track).
    Samples uniformly over tracks then uniformly over valid offsets —
    the upstream Wavset's random-crop behavior. Deterministic per seed.
    """

    def __init__(self, tracks: list[np.ndarray], segment_samples: int,
                 seed: int = 0):
        if not tracks:
            raise ValueError("no training tracks")
        self.tracks = [np.asarray(t, np.float32) for t in tracks]
        S, C = self.tracks[0].shape[:2]
        for t in self.tracks:
            if t.shape[:2] != (S, C):
                raise ValueError(f"inconsistent stem layout {t.shape[:2]} "
                                 f"vs {(S, C)}")
            if t.shape[-1] < segment_samples:
                raise ValueError("track shorter than segment_samples")
        self.segment = segment_samples
        self._rng = np.random.default_rng(seed)

    def batch(self, batch_size: int) -> np.ndarray:
        """-> (B, S, C, segment) float32."""
        out = np.empty((batch_size,) + self.tracks[0].shape[:2]
                       + (self.segment,), np.float32)
        for b in range(batch_size):
            t = self.tracks[self._rng.integers(len(self.tracks))]
            off = self._rng.integers(t.shape[-1] - self.segment + 1)
            out[b] = t[:, :, off:off + self.segment]
        return out


def load_musdb_track(track_dir: str | Path,
                     stems=("drums", "bass", "other", "vocals")
                     ) -> np.ndarray:
    """MUSDB-layout track dir ({stem}.wav files) -> (S, C, N) float32."""
    from . import audio

    arrays = []
    for stem in stems:
        x, _ = audio.read_wav(Path(track_dir) / f"{stem}.wav")
        arrays.append(np.atleast_2d(x))
    n = min(a.shape[-1] for a in arrays)
    return np.stack([a[:, :n] for a in arrays])


def make_augmented_train_step(cfg, optimizer=None, remat: bool = False,
                              ema_decay: float | None = None,
                              remat_policy: str = "dots",
                              compute_dtype=None):
    """Training step that augments ON DEVICE inside the jitted program.

    Returns (init_fn, step_fn):
      init_fn(params) -> opt_state   (or (opt_state, ema) with ema_decay)
      step_fn(params, opt_state, key, stems(B,S,C,T))
          -> (params, opt_state, loss)

    The mix is the sum of the augmented stems; the augmentation ops are
    elementwise/gather and fuse into the forward's first HBM pass. The
    optimizer/EMA logic is train.make_step_impl — shared with the
    non-augmented step, so the two can never diverge.
    """
    import functools

    import optax

    from .train import l1_loss, make_init_fn, make_step_impl

    opt = optimizer or optax.adam(3e-4)
    loss = functools.partial(l1_loss, cfg=cfg, remat=remat,
                             remat_policy=remat_policy,
                             compute_dtype=compute_dtype)
    init_fn = make_init_fn(opt, ema_decay)
    step_impl = make_step_impl(opt, loss, ema_decay)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step_fn(params, opt_state, key, stems):
        aug = augment_stems(key, stems)
        return step_impl(params, opt_state, mix_from_stems(aug), aug)

    return init_fn, step_fn


def make_augmented_multi_train_step(cfg, optimizer=None,
                                    remat: bool = False,
                                    ema_decay: float | None = None,
                                    remat_policy: str = "dots",
                                    compute_dtype=None):
    """K augmented optimizer steps per device dispatch (lax.scan) —
    the augmented counterpart of train.make_multi_train_step (which
    documents why: ~10 ms/step of host pytree marshaling amortizes to
    ~10/K, docs/PROFILE_r4.md §8).

    step_fn(params, opt_state, key, stems_stack(K,B,S,C,T)) ->
        (params, opt_state, losses(K,)); the key is split into one
    independent augmentation key per scanned step."""
    import functools

    import optax

    from .train import l1_loss, make_init_fn, make_step_impl

    opt = optimizer or optax.adam(3e-4)
    loss = functools.partial(l1_loss, cfg=cfg, remat=remat,
                             remat_policy=remat_policy,
                             compute_dtype=compute_dtype)
    init_fn = make_init_fn(opt, ema_decay)
    step_impl = make_step_impl(opt, loss, ema_decay)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def multi_step(params, opt_state, key, stems_stack):
        keys = jax.random.split(key, stems_stack.shape[0])

        def body(carry, xs):
            p, s = carry
            k, stems = xs
            aug = augment_stems(k, stems)
            p, s, l = step_impl(p, s, mix_from_stems(aug), aug)
            return (p, s), l

        (params, opt_state), losses = jax.lax.scan(
            body, (params, opt_state), (keys, stems_stack))
        return params, opt_state, losses

    return init_fn, multi_step
