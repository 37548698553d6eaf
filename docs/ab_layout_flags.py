"""Serialized e2e A/B of the layout-experiment flags on the real chip.

Runs bench.py once per config (baseline, each flag alone, all flags)
in separate processes — the flags are trace-time module globals read
from env (DT_SPLIT_PHASE / DT_FOLD_ISPEC_TRIM / DT_GLU_BIAS_FOLD /
DT_CONV3X3_TAPFOLD), and the TPU tolerates only one process at a time.
Same-process A/B is impossible here (each config is a different
compiled graph), so accept the ±1.5% tunnel noise and only trust >2%
deltas (CLAUDE.md protocol).
"""
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = [
    ("baseline", {}),
    ("split_phase", {"DT_SPLIT_PHASE": "1"}),
    ("fold_trim", {"DT_FOLD_ISPEC_TRIM": "1"}),
    ("glu_bias", {"DT_GLU_BIAS_FOLD": "1"}),
    ("conv3x3_tapfold", {"DT_CONV3X3_TAPFOLD": "1"}),
    ("all", {"DT_SPLIT_PHASE": "1", "DT_FOLD_ISPEC_TRIM": "1",
             "DT_GLU_BIAS_FOLD": "1", "DT_CONV3X3_TAPFOLD": "1"}),
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
