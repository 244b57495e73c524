"""Native (C++) tier: build-on-demand shared library + ctypes bindings.

The reference's only native dependency is the WORLD vocoder library reached
through ``pyworld`` (``/root/reference/dataset/audio_processing.py:65``); this
package carries its own C++ implementation instead (``dio.cc``), compiled once
with g++ into ``libfs2native.so`` next to this file and loaded via ctypes
(no pybind11 in the image -- ctypes is the binding layer).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("fastspeech2_tpu.native")

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "dio.cc")
_LIB = os.path.join(_HERE, "libfs2native.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> None:
    cmd = ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC",
           _SRC, "-o", _LIB]
    log.info("building native library: %s", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def load() -> ctypes.CDLL | None:
    """The native library, building it on first use. None if unbuildable
    (callers fall back to pure-Python implementations)."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        try:
            if (not os.path.exists(_LIB)
                    or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)):
                _build()
            lib = ctypes.CDLL(_LIB)
            lib.fs2_dio.restype = ctypes.c_int
            lib.fs2_dio.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
                ctypes.c_int, ctypes.c_double, ctypes.c_double,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
            ]
            lib.fs2_native_version.restype = ctypes.c_char_p
            _lib = lib
        except Exception as e:  # missing toolchain, sandboxed fs, ...
            log.warning("native library unavailable (%s); using Python paths", e)
            _build_failed = True
    return _lib


def available() -> bool:
    return load() is not None


def dio(wav: np.ndarray, sample_rate: int, hop_length: int,
        f0_floor: float = 71.0, f0_ceil: float = 800.0) -> np.ndarray:
    """Interval-based F0 track, (len(wav)//hop + 1,) float32 Hz, 0=unvoiced."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    wav32 = np.ascontiguousarray(wav, dtype=np.float32)
    n_frames = len(wav32) // hop_length + 1
    out = np.empty(n_frames, np.float32)
    got = lib.fs2_dio(
        wav32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(wav32),
        sample_rate, hop_length, f0_floor, f0_ceil,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_frames)
    if got != n_frames:
        raise RuntimeError(f"fs2_dio failed (returned {got}, want {n_frames})")
    return out
