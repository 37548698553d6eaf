"""Native (C++) runtime pieces, built on demand with g++.

The shared objects are compiled once into native/build/ and loaded via
ctypes; every native entry point has a pure-numpy fallback at its call
site, so a missing toolchain degrades gracefully.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

_DIR = Path(__file__).parent
_BUILD = _DIR / "build"


def build_and_load(name: str) -> ctypes.CDLL:
    """Compile native/<name>.cpp to a cached .so and dlopen it."""
    src = _DIR / f"{name}.cpp"
    so = _BUILD / f"lib{name}.so"
    if not so.exists() or so.stat().st_mtime < src.stat().st_mtime:
        _BUILD.mkdir(exist_ok=True)
        tmp = so.with_suffix(".so.tmp")
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
             str(src), "-o", str(tmp)],
            check=True, capture_output=True)
        tmp.replace(so)
    return ctypes.CDLL(str(so))
