"""Tiny device-health probe for tunneled TPU deployments.

The axon tunnel can go fully down for an hour+ — backend init raises
UNAVAILABLE, or a trivial matmul's host fetch hangs (CLAUDE.md). This
probe runs the smallest end-to-end check (device matmul + host fetch,
the only reliable completion fence on this platform) under a hard
subprocess timeout, so a hung runtime cannot wedge the caller.

Usage:
    python -m demucs_tpu.tools.tpu_probe [--timeout 90] [--wait MINS]
Exit 0 = device healthy; 1 = down (after --wait minutes of retries).
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

_CHECK = ("import jax; {pin}"
          "import jax.numpy as jnp; "
          "x = jnp.ones((8, 8)); "
          "assert float((x @ x).sum()) == 512.0; "
          "print(jax.devices()[0].device_kind or jax.devices()[0].platform)")


def probe(timeout_s: float = 90.0, platform: str | None = None) -> bool:
    """One probe attempt in a subprocess (a hung backend init cannot be
    interrupted in-process). platform pins a backend via jax.config —
    the only override that beats the axon sitecustomize (CLAUDE.md)."""
    pin = (f"jax.config.update('jax_platforms', '{platform}'); "
           if platform else "")
    try:
        out = subprocess.run([sys.executable, "-c",
                              _CHECK.format(pin=pin)],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    if out.returncode == 0:
        print(f"device ok: {out.stdout.strip().splitlines()[-1]}",
              file=sys.stderr)
    return out.returncode == 0


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="TPU health probe")
    ap.add_argument("--timeout", type=float, default=90.0,
                    help="seconds per probe attempt")
    ap.add_argument("--wait", type=float, default=0.0,
                    help="keep retrying for this many MINUTES before "
                         "giving up (0 = single attempt)")
    ap.add_argument("--platform", default=None,
                    help="pin a backend (e.g. cpu) instead of probing "
                         "the default (TPU) one")
    args = ap.parse_args(argv)
    deadline = time.monotonic() + args.wait * 60.0
    while True:
        if probe(args.timeout, args.platform):
            return 0
        if time.monotonic() >= deadline:
            print("device DOWN", file=sys.stderr)
            return 1
        print("device down; retrying ...", file=sys.stderr)
        time.sleep(30.0)


if __name__ == "__main__":
    sys.exit(main())
