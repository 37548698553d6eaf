"""Museval-style SDR evaluation without museval.

Counterpart of reference scripts/evaluate-demixed-output.py:20-44: the
reference calls museval's BSS-eval v4, whose headline "SDR" is the
median over 1-second windows of 10*log10(||ref||^2 / ||ref - est||^2).
That statistic is reimplemented here in numpy (museval/musdb are not in
this environment), so SDR acceptance runs offline against any stem
directory layout.

Usage:
    python -m demucs_tpu.tools.evaluate_sdr REF_DIR EST_DIR \
        [--stems drums bass other vocals]
"""

from __future__ import annotations

import argparse
import json
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


def _find_stem(d: Path, stem: str) -> Path:
    hits = sorted(p for p in d.iterdir()
                  if stem in p.name.lower() and p.suffix == ".wav")
    if not hits:
        raise FileNotFoundError(f"no {stem} wav in {d}")
    return hits[0]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="framewise-median SDR eval")
    ap.add_argument("reference_dir")
    ap.add_argument("estimate_dir")
    ap.add_argument("--stems", nargs="+",
                    default=["drums", "bass", "other", "vocals"])
    args = ap.parse_args(argv)

    from .. import audio
    results = {}
    for stem in args.stems:
        ref, _ = audio.read_wav(_find_stem(Path(args.reference_dir), stem))
        est, _ = audio.read_wav(_find_stem(Path(args.estimate_dir), stem))
        results[stem] = round(median_sdr(ref, est), 3)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
