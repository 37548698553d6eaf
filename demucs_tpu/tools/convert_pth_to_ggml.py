"""Convert a PyTorch Demucs checkpoint to the ggml weight format.

Counterpart of reference scripts/convert-pth-to-ggml.py:110-140, minus
the hub download (this environment has no egress): point it at a local
checkpoint file. Accepts either a raw state dict or the demucs
checkpoint wrapper ({'state': ...} / {'models': [...]}) and strips
common prefixes. Tensors are squeezed and stored fp16, matching the
reference writer exactly.

Usage:
    python -m demucs_tpu.tools.convert_pth_to_ggml CKPT OUT.bin \
        --kind {htdemucs_4s,htdemucs_6s,hdemucs_mmi}
"""

from __future__ import annotations

import argparse
import sys

import numpy as np

from ..params.ggml import MAGIC_BY_NAME, write_ggml


def extract_state_dict(obj) -> dict:
    """Unwrap the common demucs checkpoint containers."""
    if hasattr(obj, "state_dict"):  # full nn.Module
        obj = obj.state_dict()
    if isinstance(obj, dict):
        if "state" in obj and isinstance(obj["state"], dict):
            return obj["state"]
        if "models" in obj and isinstance(obj["models"], (list, tuple)):
            return extract_state_dict(obj["models"][0])
        return obj
    raise ValueError(f"unsupported checkpoint type {type(obj)!r}")


def to_numpy_fp16(sd: dict) -> dict[str, np.ndarray]:
    out = {}
    for name, t in sd.items():
        a = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        out[name] = np.ascontiguousarray(np.squeeze(a)).astype(np.float16)
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description="PyTorch Demucs checkpoint -> ggml")
    ap.add_argument("checkpoint", help=".pth/.th file (torch.load-able)")
    ap.add_argument("output", help="output ggml file (or checkpoint "
                                   "directory with --orbax)")
    ap.add_argument("--kind", required=True, choices=sorted(MAGIC_BY_NAME),
                    help="model family (sets the file magic)")
    ap.add_argument("--orbax", action="store_true",
                    help="write an Orbax checkpoint directory (full-shape "
                         "fp16 tensors, PyTorch names) instead of ggml")
    args = ap.parse_args(argv)

    import torch
    obj = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    sd = to_numpy_fp16(extract_state_dict(obj))
    if args.orbax:
        # Orbax keeps the schema's full shapes — un-squeeze through the
        # same shape contract the ggml reader applies on load
        from .. import config as cfgmod
        from ..params.orbax_io import save_checkpoint
        from ..params.schema import hdemucs_v3_schema, htdemucs_schema
        from ..params.tree import flatten_tree, from_state_dict

        cfg, schema_fn = {
            "htdemucs_4s": (cfgmod.HTDEMUCS_4S, htdemucs_schema),
            "htdemucs_6s": (cfgmod.HTDEMUCS_6S, htdemucs_schema),
            "hdemucs_mmi": (cfgmod.HDEMUCS_V3, hdemucs_v3_schema),
        }[args.kind]
        flat = flatten_tree(from_state_dict(sd, schema_fn(cfg),
                                            dtype=np.float16))
        save_checkpoint(args.output, flat)
    else:
        write_ggml(args.output, args.kind, sd)
    total = sum(v.nbytes for v in sd.values())
    print(f"wrote {len(sd)} tensors ({total / 1e6:.2f} MB fp16) -> "
          f"{args.output}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
