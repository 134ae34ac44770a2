"""ctypes bindings for the native (C++) audio loader (csrc/audio_loader.cpp).

Builds the shared library on first use with g++ (cached under
~/.cache/unified_audio_tpu). Falls back to the pure-Python loader when no
compiler is available.
"""
from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

_SRC = Path(__file__).resolve().parents[2] / "csrc" / "audio_loader.cpp"
_CACHE = Path(
    os.environ.get("UNIFIED_AUDIO_CACHE",
                   Path.home() / ".cache" / "unified_audio_tpu")
)


def _build_library() -> Optional[Path]:
    if not _SRC.exists():
        return None
    _CACHE.mkdir(parents=True, exist_ok=True)
    tag = hashlib.sha256(_SRC.read_bytes()).hexdigest()[:16]
    so = _CACHE / f"audio_loader_{tag}.so"
    if so.exists():
        return so
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
             str(_SRC), "-o", str(so)],
            check=True, capture_output=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError):
        return None
    return so


_lib = None


def get_library():
    global _lib
    if _lib is None:
        so = _build_library()
        if so is None:
            raise RuntimeError("native audio loader unavailable (no g++)")
        lib = ctypes.CDLL(str(so))
        lib.loader_create.restype = ctypes.c_void_p
        lib.loader_create.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint64,
        ]
        lib.loader_next.restype = ctypes.c_int
        lib.loader_next.argtypes = [ctypes.c_void_p,
                                    ctypes.POINTER(ctypes.c_float)]
        lib.loader_destroy.argtypes = [ctypes.c_void_p]
        lib.wav_read.restype = ctypes.c_int
        lib.wav_read.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
        ]
        _lib = lib
    return _lib


def native_available() -> bool:
    try:
        get_library()
        return True
    except RuntimeError:
        return False


def read_wav_native(path, max_seconds: float = 600.0):
    """-> (samples (T,) float32, sample_rate). First channel only."""
    lib = get_library()
    max_len = int(max_seconds * 48000)
    buf = np.empty(max_len, np.float32)
    sr = ctypes.c_int(0)
    n = lib.wav_read(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_len, ctypes.byref(sr),
    )
    if n < 0:
        raise IOError(f"failed to read {path}")
    return buf[:n].copy(), sr.value


class NativeAudioLoader:
    """Background C++ prefetch of random fixed-length crops.

    next() -> (batch, crop_len) float32. Use as a context manager.
    """

    def __init__(self, paths: Sequence, crop_len: int, batch: int,
                 workers: int = 4, capacity: int = 4, seed: int = 0):
        self.lib = get_library()
        self.crop_len = crop_len
        self.batch = batch
        encoded = [str(p).encode() for p in paths]
        arr = (ctypes.c_char_p * len(encoded))(*encoded)
        self.handle = self.lib.loader_create(
            arr, len(encoded), crop_len, batch, workers, capacity, seed
        )
        self._buf = np.empty((batch, crop_len), np.float32)

    def next(self) -> np.ndarray:
        ok = self.lib.loader_next(
            self.handle,
            self._buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        )
        if not ok:
            raise StopIteration
        return self._buf.copy()

    def close(self):
        if self.handle:
            self.lib.loader_destroy(self.handle)
            self.handle = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
