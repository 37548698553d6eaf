"""Museval-style BSS-eval v4 evaluation without museval.

Counterpart of reference scripts/evaluate-demixed-output.py:20-44: the
reference calls museval's BSS-eval v4 (SDR/SIR/ISR/SAR over 1-second
windows, median-aggregated). museval/musdb are not in this environment,
so the v4 math is reimplemented in numpy:

With v4's distortion-filter length of 1, each window decomposes the
estimate of source j against the stack of ALL reference stems
(J sources x C channels as a basis):

    P_j    = least-squares projection of est_j onto ref_j's channels
    P_all  = least-squares projection of est_j onto all J*C channels
    e_spat   = P_j   - ref_j
    e_interf = P_all - P_j
    e_artif  = est_j - P_all

    SDR = 10log10 ||ref_j||^2            / ||est_j - ref_j||^2
    ISR = 10log10 ||ref_j||^2            / ||e_spat||^2
    SIR = 10log10 ||ref_j + e_spat||^2   / ||e_interf||^2
    SAR = 10log10 ||ref_j + e_spat + e_interf||^2 / ||e_artif||^2

(note e_spat + e_interf + e_artif == est_j - ref_j, so the v4 SDR is
the plain energy ratio — the decomposition only matters for the other
three). Median over non-silent windows, like museval.

Usage:
    python -m demucs_tpu.tools.evaluate_sdr REF_DIR EST_DIR \
        [--stems drums bass other vocals] [--sdr-only]
"""

from __future__ import annotations

import argparse
import json
import re
import sys
from pathlib import Path

import numpy as np

SAMPLE_RATE = 44100


def sdr_framewise(ref: np.ndarray, est: np.ndarray,
                  win: int = SAMPLE_RATE, hop: int | None = None
                  ) -> np.ndarray:
    """Per-window SDR (dB) for (C, N) stems — bsseval v4 convention."""
    hop = hop or win
    n = min(ref.shape[-1], est.shape[-1])
    ref, est = ref[..., :n], est[..., :n]
    scores = []
    for start in range(0, n - win + 1, hop):
        r = ref[..., start:start + win]
        e = est[..., start:start + win]
        num = np.sum(np.square(r), dtype=np.float64)
        den = np.sum(np.square(r - e), dtype=np.float64)
        if num < 1e-10:       # silent reference window: skip (museval does)
            continue
        scores.append(10.0 * np.log10(num / max(den, 1e-12)))
    return np.asarray(scores)


def median_sdr(ref: np.ndarray, est: np.ndarray) -> float:
    s = sdr_framewise(ref, est)
    return float(np.median(s)) if s.size else float("nan")


def _db(num: float, den: float) -> float:
    if num < 1e-10:
        return float("nan")
    return 10.0 * np.log10(num / max(den, 1e-12))


def bss_eval_framewise(refs: np.ndarray, ests: np.ndarray,
                       win: int = SAMPLE_RATE, hop: int | None = None
                       ) -> dict[str, np.ndarray]:
    """BSS-eval v4 metrics for all sources at once.

    refs/ests: (J, C, N). Returns {"SDR"|"ISR"|"SIR"|"SAR": (J, n_win)}
    with NaN for windows whose reference stem is silent.
    """
    hop = hop or win
    J, C, n_ref = refs.shape
    n = min(n_ref, ests.shape[-1])
    refs, ests = refs[..., :n], ests[..., :n]
    starts = range(0, n - win + 1, hop)
    out = {k: np.full((J, len(list(starts))), np.nan)
           for k in ("SDR", "ISR", "SIR", "SAR")}

    for w, start in enumerate(range(0, n - win + 1, hop)):
        R = refs[..., start:start + win].astype(np.float64)  # (J, C, T)
        E = ests[..., start:start + win].astype(np.float64)
        B = R.reshape(J * C, win)                 # all-stems basis
        G = B @ B.T                               # (J*C, J*C) Gram
        for j in range(J):
            r = R[j]                              # (C, T)
            e = E[j]
            num_ref = float(np.sum(r * r))
            if num_ref < 1e-10:
                continue
            # projection onto own stem's channels
            Gj = r @ r.T                          # (C, C)
            coef_j = np.linalg.lstsq(Gj, r @ e.T, rcond=None)[0]
            P_j = coef_j.T @ r                    # (C, T)
            # projection onto all stems' channels
            coef_all = np.linalg.lstsq(G, B @ e.T, rcond=None)[0]
            P_all = coef_all.T @ B                # (C, T)

            e_spat = P_j - r
            e_interf = P_all - P_j
            e_artif = e - P_all
            out["SDR"][j, w] = _db(num_ref, float(np.sum((e - r) ** 2)))
            out["ISR"][j, w] = _db(num_ref, float(np.sum(e_spat ** 2)))
            out["SIR"][j, w] = _db(float(np.sum(P_j ** 2)),
                                   float(np.sum(e_interf ** 2)))
            out["SAR"][j, w] = _db(float(np.sum(P_all ** 2)),
                                   float(np.sum(e_artif ** 2)))
    return out


def median_bss_eval(refs: np.ndarray, ests: np.ndarray) -> dict[str, list]:
    """Median-over-windows BSS-eval v4 per source (museval aggregation)."""
    frames = bss_eval_framewise(refs, ests)
    return {k: [round(float(np.nanmedian(v[j])), 3)
                if np.isfinite(v[j]).any() else float("nan")
                for j in range(v.shape[0])]
            for k, v in frames.items()}


def _find_stem(d: Path, stem: str) -> Path:
    """Locate the wav for `stem`, preferring exact naming over substring.

    Priority: `{stem}.wav` == exact, then the CLI's `target_{i}_{stem}.wav`,
    then word-boundary match, then bare substring (so 'other' never
    grabs 'another.wav' when a real 'other' file exists)."""
    wavs = sorted(p for p in d.iterdir() if p.suffix == ".wav")
    low = stem.lower()
    for pat in (lambda n: n == f"{low}.wav",
                lambda n: re.fullmatch(rf"target_\d+_{re.escape(low)}\.wav", n),
                lambda n: re.search(rf"(^|[^a-z]){re.escape(low)}([^a-z]|$)", n),
                lambda n: low in n):
        hits = [p for p in wavs if pat(p.name.lower())]
        if hits:
            return hits[0]
    raise FileNotFoundError(f"no {stem} wav in {d}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="BSS-eval v4 (SDR/ISR/SIR/SAR)")
    ap.add_argument("reference_dir")
    ap.add_argument("estimate_dir")
    ap.add_argument("--stems", nargs="+",
                    default=["drums", "bass", "other", "vocals"])
    ap.add_argument("--sdr-only", action="store_true",
                    help="plain per-stem SDR (no projections; faster)")
    args = ap.parse_args(argv)

    from .. import audio
    refs, ests = [], []
    for stem in args.stems:
        ref, _ = audio.read_wav(_find_stem(Path(args.reference_dir), stem))
        est, _ = audio.read_wav(_find_stem(Path(args.estimate_dir), stem))
        refs.append(ref)
        ests.append(est)

    if args.sdr_only:
        results = {stem: round(median_sdr(r, e), 3)
                   for stem, r, e in zip(args.stems, refs, ests)}
    else:
        n = min(min(r.shape[-1] for r in refs), min(e.shape[-1] for e in ests))
        med = median_bss_eval(np.stack([r[..., :n] for r in refs]),
                              np.stack([e[..., :n] for e in ests]))
        results = {stem: {k: med[k][j] for k in med}
                   for j, stem in enumerate(args.stems)}
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
