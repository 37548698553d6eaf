"""Serialized e2e A/B of the layout flags on the real chip.

ADJUDICATED (round 3, v5e via tunnel; ±1.5% tunnel noise, CLAUDE.md
protocol — only >2% or consistently-replicating deltas trusted):

    sweep 1: baseline 724.8 | split_phase 710.9 | fold_trim 730.3
             | glu_bias 738.8 | conv3x3_tapfold 711.4 | all 700.1
    sweep 2: baseline 728.3 / 725.3 | glu_bias 735.4 / 737.0
             | fold_trim 733.3 | glu+trim 741.4

Decisions:
  - DT_SPLIT_PHASE, DT_CONV3X3_TAPFOLD: consistent losers (-1.9%),
    experiment code DELETED (negative results recorded in
    ops/conv.py docstrings).
  - DT_GLU_BIAS_FOLD (+1.3..1.9% in 3/3 samples) and
    DT_FOLD_ISPEC_TRIM (+0.8% in 2/2), +2.0% combined: both now
    DEFAULT ON (models/htdemucs.py). Set =0 to A/B the old path.

This driver now re-checks the adopted defaults against the legacy
path. Runs bench.py once per config in separate processes — the flags
are trace-time module globals read from env, and the TPU tolerates
only one process at a time.
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("default(folds on)", {}),
    ("no_glu_bias", {"DT_GLU_BIAS_FOLD": "0"}),
    ("no_fold_trim", {"DT_FOLD_ISPEC_TRIM": "0"}),
    ("legacy(folds off)", {"DT_GLU_BIAS_FOLD": "0",
                           "DT_FOLD_ISPEC_TRIM": "0"}),
]


def main():
    results = {}
    for name, extra in CONFIGS:
        env = dict(os.environ, **extra)
        print(f"=== {name} {extra}", flush=True)
        try:
            # generous cap: a cold tunnel compile alone can take 10 min;
            # a hung run must not discard the configs already measured
            p = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")],
                env=env, capture_output=True, text=True, timeout=2400)
            line = (p.stdout.strip().splitlines()[-1]
                    if p.stdout.strip() else "")
            print(line or p.stderr[-500:], flush=True)
            results[name] = json.loads(line)["value"]
        except Exception as e:
            print(f"{name} failed: {type(e).__name__}", flush=True)
            results[name] = None
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
