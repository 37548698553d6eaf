"""SDR acceptance gate: JAX pipeline vs the torch oracle on real audio.

Automates the reference's tier-4 methodology (SURVEY.md §4: run both
implementations on a track with the shift pinned to 1337, SDR each
against ground-truth stems, require <= 0.1 dB per-stem delta,
.github/SDR_scores.md). With MUSDB18-HQ ground truth present pass
--ref-dir; without it the tool still reports the cross-implementation
SDR (JAX estimate scored against the torch estimate — a lower bound on
agreement: >= ~40 dB means numerically interchangeable).

Usage:
    python -m demucs_tpu.tools.sdr_acceptance MODEL.bin TRACK.wav \
        [--ref-dir musdb_track_dir] [--tolerance-db 0.1] [--workdir DIR]
    python -m demucs_tpu.tools.sdr_acceptance --ft-dir MODELS/ TRACK.wav
        # BagOfModels gate (the reference's best SDR row,
        # .github/SDR_scores.md:48-61): the JAX ensemble vs the torch
        # oracle ensemble, gated per stem
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
from pathlib import Path

import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="SDR acceptance gate")
    ap.add_argument("model", nargs="?",
                    help="ggml weight file (or use --ft-dir)")
    ap.add_argument("input")
    ap.add_argument("--ft-dir", default=None,
                    help="directory with the 4 htdemucs_ft_* files: "
                         "gate the BagOfModels ensemble (JAX bag vs "
                         "torch oracle bag, per stem)")
    ap.add_argument("--ref-dir", default=None,
                    help="ground-truth stem dir (MUSDB layout)")
    ap.add_argument("--tolerance-db", type=float, default=0.1)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--segment-samples", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.model) == bool(args.ft_dir):
        ap.error("provide exactly one of `model` or --ft-dir")

    from .. import audio
    from ..cli import main as cli_main
    from .evaluate_sdr import _find_stem, median_sdr
    from .torch_inference import main as torch_main

    work = Path(args.workdir or tempfile.mkdtemp(prefix="sdr_accept_"))
    jax_dir, torch_dir = work / "jax", work / "torch"

    sel = [args.model] if args.model else ["--ft-dir", args.ft_dir]
    common = sel + [args.input, None, "--offset", "1337"]
    if args.segment_samples:
        common += ["--segment-samples", str(args.segment_samples)]
    out_at = len(sel) + 1

    a = list(common)
    a[out_at] = str(jax_dir)
    if cli_main(a + ["--no-mesh"]) != 0:
        return 1
    t = list(common)
    t[out_at] = str(torch_dir)
    if torch_main(t) != 0:
        return 1

    if args.ft_dir:
        # the ft ensemble is always the 4-source family
        sources = ("drums", "bass", "other", "vocals")
    else:
        import struct

        from ..params.ggml import GGML_MAGICS

        # stem names need only the 4-byte magic, not a full weight parse
        with open(args.model, "rb") as f:
            (magic,) = struct.unpack("<i", f.read(4))
        kind = GGML_MAGICS.get(magic)
        sources = (("drums", "bass", "other", "vocals", "guitar", "piano")
                   if kind == "htdemucs_6s"
                   else ("drums", "bass", "other", "vocals"))

    def _num(x):  # NaN (silent / <1 s windows) must not leak into JSON
        return None if (x != x) else round(x, 3)

    report = {}
    ok = True
    for i, stem in enumerate(sources):
        jx, _ = audio.read_wav(jax_dir / f"target_{i}_{stem}.wav")
        tx, _ = audio.read_wav(torch_dir / f"target_{i}_{stem}.wav")
        cross = median_sdr(tx, jx)   # agreement between implementations
        entry = {"cross_impl_sdr_db": _num(cross)}
        if args.ref_dir:
            try:
                ref, _ = audio.read_wav(_find_stem(Path(args.ref_dir), stem))
            except FileNotFoundError:
                print(f"warning: no {stem} ground truth in {args.ref_dir}",
                      file=sys.stderr)
                ref = None
            if ref is not None:
                s_jax = median_sdr(ref, jx)
                s_torch = median_sdr(ref, tx)
                delta = abs(s_jax - s_torch)
                entry.update({"jax_sdr_db": _num(s_jax),
                              "torch_sdr_db": _num(s_torch),
                              "delta_db": _num(delta)})
                ok &= delta <= args.tolerance_db  # NaN compares False -> fail
        else:
            # no ground truth: gate on cross-implementation agreement
            ok &= (cross == cross) and cross >= 30.0
        report[stem] = entry

    report["pass"] = bool(ok)
    print(json.dumps(report))
    return 0 if ok else 2


if __name__ == "__main__":
    sys.exit(main())
