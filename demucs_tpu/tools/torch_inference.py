"""Ground-truth PyTorch inference from a ggml weight file.

Counterpart of reference scripts/demucs_pytorch_inference.py:50-72: runs
the *torch* oracle models (tools/torch_ref*.py) through the exact same
normalize / shift / overlap-add pipeline as the JAX path, producing
target_{i}_{stem}.wav for SDR comparison. Because both frameworks share
pipeline.Separator, any output difference is purely model numerics.

Usage:
    python -m demucs_tpu.tools.torch_inference MODEL.bin IN.wav OUT_DIR \
        [--offset 1337] [--segment-samples N]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

from .. import audio
from ..config import HDemucsV3Config
from ..params import flatten_tree
from ..params.ggml import load_model_params
from ..pipeline import ApplyOptions, Separator
from ..utils.progress import print_progress


def build_torch_model(cfg, params):
    import torch

    if isinstance(cfg, HDemucsV3Config):
        from .torch_ref_v3 import HDemucsV3Ref
        model = HDemucsV3Ref(cfg)
    else:
        from .torch_ref import HTDemucsRef
        model = HTDemucsRef(cfg)
    flat = flatten_tree(params)
    model.load_state_dict(
        {k: torch.from_numpy(np.asarray(v)) for k, v in flat.items()},
        strict=True)
    model.eval()
    return model


def _torch_separator(model_path, opts) -> tuple[Separator, tuple[str, ...]]:
    import torch

    cfg, params = load_model_params(model_path)
    model = build_torch_model(cfg, params)

    def torch_fn(_, mix_batch):
        with torch.no_grad():
            return model(torch.from_numpy(np.asarray(mix_batch))).numpy()

    return Separator(torch_fn, None, cfg.num_sources, opts,
                     jit=False), cfg.sources


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="torch oracle inference")
    ap.add_argument("model", nargs="?",
                    help="ggml weight file (or use --ft-dir)")
    ap.add_argument("input")
    ap.add_argument("outdir")
    ap.add_argument("--ft-dir", help="directory with 4 htdemucs_ft_* "
                                     "files (BagOfModels oracle: stem i "
                                     "from model i, the ft convention — "
                                     "reference cli-apps/demucs_ft.cpp)")
    ap.add_argument("--offset", type=int, default=1337)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--segment-samples", type=int, default=None)
    args = ap.parse_args(argv)
    if bool(args.model) == bool(args.ft_dir):
        ap.error("provide exactly one of `model` or --ft-dir")

    opts = ApplyOptions(batch_size=args.batch,
                        shift_offset=args.offset).with_segment(
                            args.segment_samples)
    track = audio.load_track(args.input)

    if args.ft_dir:
        from ..cli import _find_ft_models

        paths = _find_ft_models(Path(args.ft_dir))
        stems, sources = [], None
        for i, p in enumerate(paths):
            sep, sources = _torch_separator(p, opts)
            out = sep(track, progress=print_progress)
            stems.append(np.asarray(out[i]))  # ft: stem i from model i
            print(f"oracle model {i + 1}/4 done", file=sys.stderr)
        out = np.stack(stems)
    else:
        sep, sources = _torch_separator(args.model, opts)
        out = sep(track, progress=print_progress)

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for i, name in enumerate(sources):
        audio.write_wav(outdir / f"target_{i}_{name}.wav", np.asarray(out[i]))
        print(f"wrote target_{i}_{name}.wav", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
