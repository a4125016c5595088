"""ctypes bindings to the native host-side kernels (librs_native.so).

Build with ``make -C reazonspeech_tpu/native`` (g++, no external deps). Every
binding has a pure-Python fallback at its call site, so the package works
without the shared library; with it, CER over long transcripts and corpus-
scale TS scanning run at C++ speed.
"""

import ctypes
import os
import subprocess

import numpy as np

__all__ = ["available", "edit_distance", "ts_scan_pid", "pcm16_to_f32", "downmix_mean", "wav_info", "wav_batch_load"]

_LIB_PATH = os.path.join(os.path.dirname(__file__), "librs_native.so")
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH):
        # best-effort local build (toolchain is expected in dev images)
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(__file__)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception:
            _lib = False
            return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.rs_edit_distance.restype = ctypes.c_int64
        lib.rs_edit_distance.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.rs_pcm16_to_f32.restype = None
        lib.rs_pcm16_to_f32.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p,
        ]
        lib.rs_ts_scan_pid.restype = ctypes.c_int64
        lib.rs_ts_scan_pid.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.rs_downmix_mean.restype = None
        lib.rs_downmix_mean.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_void_p,
        ]
        lib.rs_wav_info.restype = ctypes.c_int32
        lib.rs_wav_info.argtypes = [
            ctypes.c_char_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.rs_wav_batch_load.restype = None
        lib.rs_wav_batch_load.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32, ctypes.c_void_p,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_int32,
        ]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def available() -> bool:
    return bool(_load())


def edit_distance(s: str, t: str) -> int:
    lib = _load()
    if not lib:
        raise RuntimeError("native library unavailable")
    a = np.frombuffer(s.encode("utf-32-le"), np.uint32)
    b = np.frombuffer(t.encode("utf-32-le"), np.uint32)
    return int(
        lib.rs_edit_distance(
            a.ctypes.data, len(a), b.ctypes.data, len(b)
        )
    )


def ts_scan_pid(data: bytes, pid: int, require_pusi: bool = True) -> np.ndarray:
    """Byte offsets of 188-byte TS packets matching pid (and PUSI)."""
    lib = _load()
    if not lib:
        raise RuntimeError("native library unavailable")
    buf = np.frombuffer(data, np.uint8)
    max_out = len(data) // 188 + 1
    out = np.zeros(max_out, np.int64)
    n = lib.rs_ts_scan_pid(
        buf.ctypes.data, len(buf), pid, int(require_pusi), out.ctypes.data, max_out
    )
    return out[:n]


def pcm16_to_f32(pcm: np.ndarray) -> np.ndarray:
    lib = _load()
    if not lib:
        raise RuntimeError("native library unavailable")
    pcm = np.ascontiguousarray(pcm, np.int16)
    out = np.empty(pcm.shape, np.float32)
    lib.rs_pcm16_to_f32(pcm.ctypes.data, pcm.size, out.ctypes.data)
    return out


def downmix_mean(x: np.ndarray) -> np.ndarray:
    """[frames, channels] float32 -> [frames] mono."""
    lib = _load()
    if not lib:
        raise RuntimeError("native library unavailable")
    x = np.ascontiguousarray(x, np.float32)
    frames, ch = x.shape
    out = np.empty(frames, np.float32)
    lib.rs_downmix_mean(x.ctypes.data, frames, ch, out.ctypes.data)
    return out


def wav_info(path):
    """(sample_rate, mono_frames) from the WAV header only."""
    lib = _load()
    if not lib:
        raise RuntimeError("native library unavailable")
    sr = ctypes.c_int32()
    n = ctypes.c_int64()
    rc = lib.rs_wav_info(
        str(path).encode(), ctypes.byref(sr), ctypes.byref(n)
    )
    if rc != 0:
        raise OSError(f"not a readable PCM WAV: {path}")
    return int(sr.value), int(n.value)


def wav_batch_load(paths, stride, num_threads=8):
    """Decode WAV files concurrently into a zero-padded [n, stride] float32
    batch (mono mean-downmix). Returns (batch, lengths); a length of -1
    marks a file the native decoder refused (caller falls back per-file)."""
    lib = _load()
    if not lib:
        raise RuntimeError("native library unavailable")
    n = len(paths)
    out = np.zeros((n, stride), np.float32)
    lengths = np.zeros(n, np.int64)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    lib.rs_wav_batch_load(
        arr, n, out.ctypes.data, stride, lengths.ctypes.data, num_threads
    )
    return out, lengths
