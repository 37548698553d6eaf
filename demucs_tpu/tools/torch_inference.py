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


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="torch oracle inference")
    ap.add_argument("model")
    ap.add_argument("input")
    ap.add_argument("outdir")
    ap.add_argument("--offset", type=int, default=1337)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--segment-samples", type=int, default=None)
    args = ap.parse_args(argv)

    import torch

    cfg, params = load_model_params(args.model)
    model = build_torch_model(cfg, params)

    def torch_fn(_, mix_batch):
        with torch.no_grad():
            return model(torch.from_numpy(np.asarray(mix_batch))).numpy()

    opts = ApplyOptions(batch_size=args.batch,
                        shift_offset=args.offset).with_segment(
                            args.segment_samples)
    sep = Separator(torch_fn, None, cfg.num_sources, opts, jit=False)

    track = audio.load_track(args.input)
    out = sep(track, progress=print_progress)

    outdir = Path(args.outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    for i, name in enumerate(cfg.sources):
        audio.write_wav(outdir / f"target_{i}_{name}.wav", np.asarray(out[i]))
        print(f"wrote target_{i}_{name}.wav", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
