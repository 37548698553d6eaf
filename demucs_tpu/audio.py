"""WAV read/write with zero third-party deps.

TPU-framework equivalent of the reference's libnyquist usage
(reference cli-apps/demucs.cpp:21-106): 44.1 kHz only, mono is
duplicated to stereo, output stems written as float32 or 16-bit PCM
WAV. Stdlib `wave` handles the chunk framing; PCM 24-bit is decoded
manually (wave returns raw bytes).

The hot decode path (format conversion + interleaved->planar) is
native C++ (native/wav_io.cpp, mirroring the reference's C++ audio
runtime) with this module's pure-numpy implementation as fallback;
both are asserted bit-identical in tests/test_native.py.
"""

from __future__ import annotations

import ctypes
import struct
import wave
from pathlib import Path

import numpy as np

from .config import SAMPLE_RATE

_wav_native = None


def _native():
    """Load (once) the native codec; None if the toolchain is absent."""
    global _wav_native
    if _wav_native is None:
        try:
            from .native import build_and_load

            lib = build_and_load("wav_io")
            u8 = ctypes.POINTER(ctypes.c_uint8)
            lib.wav_parse_header.restype = ctypes.c_int
            lib.wav_parse_header.argtypes = [
                u8, ctypes.c_uint64, ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_uint64)]
            lib.wav_decode_f32.restype = ctypes.c_int
            lib.wav_decode_f32.argtypes = [
                u8, ctypes.c_uint64, ctypes.POINTER(ctypes.c_float)]
            lib.wav_encode_pcm16.restype = ctypes.c_int
            lib.wav_encode_pcm16.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
                ctypes.c_int32, ctypes.POINTER(ctypes.c_int16)]
            _wav_native = lib
        except Exception:
            _wav_native = False
    return _wav_native or None


def _read_wav_native(raw: bytes) -> tuple[np.ndarray, int] | None:
    lib = _native()
    if lib is None:
        return None
    buf = (ctypes.c_uint8 * len(raw)).from_buffer_copy(raw)
    ch = ctypes.c_int32()
    rate = ctypes.c_int32()
    bits = ctypes.c_int32()
    tag = ctypes.c_int32()
    frames = ctypes.c_int64()
    off = ctypes.c_uint64()
    rc = lib.wav_parse_header(buf, len(raw), ch, rate, bits, tag, frames, off)
    if rc:
        return None  # fall back so the Python path raises the rich error
    out = np.empty((ch.value, frames.value), np.float32)
    rc = lib.wav_decode_f32(
        buf, len(raw), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    if rc:
        return None
    return out, rate.value


def read_wav(path: str | Path, native: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file -> ((channels, n) float32 in [-1, 1], sample_rate).

    Supports PCM 8/16/24/32-bit and IEEE float32/float64.
    """
    raw = Path(path).read_bytes()
    if native:
        decoded = _read_wav_native(raw)
        if decoded is not None:
            return decoded
    if raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        raise ValueError(f"{path}: not a RIFF/WAVE file")
    # walk chunks ourselves: stdlib wave rejects WAVE_FORMAT_IEEE_FLOAT
    pos = 12
    fmt = None
    data = None
    while pos + 8 <= len(raw):
        cid = raw[pos:pos + 4]
        (size,) = struct.unpack_from("<I", raw, pos + 4)
        body = raw[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None:
        raise ValueError(f"{path}: missing fmt/data chunk")
    tag, channels, rate, _, _, bits = struct.unpack_from("<HHIIHH", fmt, 0)
    if tag == 0xFFFE and len(fmt) >= 40:  # WAVE_FORMAT_EXTENSIBLE
        (tag,) = struct.unpack_from("<H", fmt, 24)

    if tag == 1:  # PCM
        if bits == 8:
            x = (raw_to(data, np.uint8).astype(np.float32) - 128.0) / 128.0
        elif bits == 16:
            x = raw_to(data, np.int16).astype(np.float32) / 32768.0
        elif bits == 24:
            b = np.frombuffer(data, np.uint8)
            b = b[: len(b) - len(b) % 3].reshape(-1, 3)
            v = (b[:, 0].astype(np.int32)
                 | (b[:, 1].astype(np.int32) << 8)
                 | (b[:, 2].astype(np.int32) << 16))
            v = np.where(v & 0x800000, v - 0x1000000, v)
            x = v.astype(np.float32) / 8388608.0
        elif bits == 32:
            x = raw_to(data, np.int32).astype(np.float32) / 2147483648.0
        else:
            raise ValueError(f"{path}: unsupported PCM width {bits}")
    elif tag == 3:  # IEEE float
        x = raw_to(data, np.float32 if bits == 32 else np.float64).astype(np.float32)
    else:
        raise ValueError(f"{path}: unsupported format tag {tag}")

    x = x[: len(x) - len(x) % channels].reshape(-1, channels).T
    return np.ascontiguousarray(x), rate


def raw_to(data: bytes, dtype) -> np.ndarray:
    itemsize = np.dtype(dtype).itemsize
    return np.frombuffer(data[: len(data) - len(data) % itemsize], dtype)


def write_wav(path: str | Path, audio: np.ndarray, rate: int = SAMPLE_RATE,
              pcm16: bool = False) -> None:
    """Write (channels, n) float32 as WAV (float32 default, or 16-bit PCM)."""
    audio = np.atleast_2d(np.asarray(audio, np.float32))
    channels, n = audio.shape
    if pcm16:
        lib = _native()
        if lib is not None:
            # native path interleaves itself — don't pay the full-track
            # transpose copy the float32 writer needs
            planar = np.ascontiguousarray(audio)
            pcm = np.empty((n, channels), np.int16)
            lib.wav_encode_pcm16(
                planar.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n, channels,
                pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)))
            frames = pcm.tobytes()
        else:
            clipped = np.clip(np.ascontiguousarray(audio.T), -1.0, 1.0)
            frames = np.round(clipped * 32767.0).astype(np.int16).tobytes()
        with wave.open(str(path), "wb") as w:
            w.setnchannels(channels)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(frames)
        return
    # IEEE float32 WAV (stdlib wave can't write format tag 3)
    payload = np.ascontiguousarray(audio.T).tobytes()
    block = channels * 4
    # RIFF content size: "WAVE"(4) + fmt(8+18) + fact(8+4) + data hdr(8) + payload
    hdr = b"".join([
        b"RIFF", struct.pack("<I", 4 + 26 + 12 + 8 + len(payload)), b"WAVE",
        b"fmt ", struct.pack("<IHHIIHH", 18, 3, channels, rate,
                             rate * block, block, 32), b"\x00\x00",
        b"fact", struct.pack("<II", 4, n),
        b"data", struct.pack("<I", len(payload)),
    ])
    Path(path).write_bytes(hdr + payload)


def load_track(path: str | Path) -> np.ndarray:
    """Read + validate like the reference CLI: require 44.1 kHz, return
    stereo (2, n) (mono duplicated; reference cli-apps/demucs.cpp:30-76)."""
    audio, rate = read_wav(path)
    if rate != SAMPLE_RATE:
        raise ValueError(
            f"{path}: demucs supports {SAMPLE_RATE} Hz only, got {rate}")
    if audio.shape[0] == 1:
        audio = np.repeat(audio, 2, axis=0)
    elif audio.shape[0] > 2:
        audio = audio[:2]
    return audio
