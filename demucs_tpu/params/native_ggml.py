"""ctypes binding for the native ggml parser (native/ggml_loader.cpp).

load(data) has the same contract as ggml._load_ggml_numpy: the record
iteration and fp16 handling run in C++ (the reference's loader layer is
C++ too, src/model_load.cpp); tensor payloads are copied out of the
input buffer exactly once.
"""

from __future__ import annotations

import ctypes

import numpy as np

from ..native import build_and_load

# name is NOT NUL-terminated in the format -> raw pointer + explicit len
_CB = ctypes.CFUNCTYPE(
    None, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32,
    ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_uint16),
    ctypes.c_int64)

_lib = build_and_load("ggml_loader")
_lib.demucs_ggml_parse.restype = ctypes.c_int32
_lib.demucs_ggml_parse.argtypes = [
    ctypes.c_char_p, ctypes.c_int64, _CB, ctypes.c_void_p]
_lib.demucs_fp16_to_fp32.restype = None
_lib.demucs_fp16_to_fp32.argtypes = [
    ctypes.POINTER(ctypes.c_uint16), ctypes.POINTER(ctypes.c_float),
    ctypes.c_int64]


def load(data: bytes) -> tuple[str, dict[str, np.ndarray]]:
    from .ggml import GGML_MAGICS, check_magic

    check_magic(data)
    tensors: dict[str, np.ndarray] = {}

    @_CB
    def visit(_ctx, name, name_len, n_dims, shape, fp16, count):
        ne = tuple(shape[i] for i in range(n_dims))
        arr = np.ctypeslib.as_array(fp16, shape=(count,)).copy()
        key = ctypes.string_at(name, name_len).decode("utf-8")
        tensors[key] = arr.view(np.float16).reshape(ne)

    magic = _lib.demucs_ggml_parse(data, len(data), visit, None)
    if magic == -1:
        raise ValueError("corrupt or truncated ggml file")
    if magic not in GGML_MAGICS:
        raise ValueError(f"bad ggml magic 0x{magic & 0xFFFFFFFF:08x}")
    return GGML_MAGICS[magic], tensors


def fp16_to_fp32(x: np.ndarray) -> np.ndarray:
    """Native widening (reference load_single_* conversion,
    src/model_load.cpp:1092-1300)."""
    x = np.ascontiguousarray(x, dtype=np.float16)
    out = np.empty(x.shape, np.float32)
    _lib.demucs_fp16_to_fp32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        x.size)
    return out
