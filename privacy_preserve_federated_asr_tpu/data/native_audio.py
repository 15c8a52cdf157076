"""ctypes binding for the native audio-ingest library (native/wavio.cpp).

The C++ side re-implements the Python loader's exact semantics
(data/audio.py `load_audio`: RIFF parse, channel-mean downmix, integer
scaling, scipy-parity polyphase resampling, peak normalization) plus a
threaded whole-corpus loader. Everything here degrades gracefully: if the
shared library is absent and cannot be built (`make -C native`), callers
fall back to the scipy path.

The reference's ingest is librosa/scipy in Python and measures ~7m47s for
1,869 files (reference: centralized/finetune_ASRs.py:148); this is the
framework's native replacement for that hot path.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

from ..utils.native import load_native_lib


def _setup(lib: ctypes.CDLL) -> None:
    lib.dacs_load_wav.restype = ctypes.c_long
    lib.dacs_load_wav.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float))]
    lib.dacs_free.restype = None
    lib.dacs_free.argtypes = [ctypes.POINTER(ctypes.c_float)]
    lib.dacs_load_many.restype = ctypes.c_long
    lib.dacs_load_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.POINTER(ctypes.c_long)]


def _load_lib():
    return load_native_lib("libdacsaudio.so", "wavio.cpp", _setup)


def available() -> bool:
    """True when the native library is loadable (building it on demand)."""
    return _load_lib() is not None


def load_audio_native(path: str, target_sr: int = 16000,
                      normalize: bool = True) -> np.ndarray:
    """Native equivalent of data/audio.py `load_audio`. Raises RuntimeError
    when the library is unavailable or the file cannot be decoded."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    out = ctypes.POINTER(ctypes.c_float)()
    n = lib.dacs_load_wav(os.fsencode(path), target_sr, int(normalize),
                          ctypes.byref(out))
    if n < 0:
        raise RuntimeError(f"native wav load failed ({n}): {path}")
    try:
        return np.ctypeslib.as_array(out, shape=(n,)).copy()
    finally:
        lib.dacs_free(out)


def load_many_native(paths: list[str], target_sr: int = 16000,
                     normalize: bool = True,
                     n_threads: int | None = None) -> list[np.ndarray | None]:
    """Threaded corpus load; element i is None when file i failed."""
    lib = _load_lib()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    n = len(paths)
    if n == 0:
        return []
    if n_threads is None:
        n_threads = min(max(os.cpu_count() or 1, 1) * 2, 16)
    c_paths = (ctypes.c_char_p * n)(*[os.fsencode(p) for p in paths])
    outs = (ctypes.POINTER(ctypes.c_float) * n)()
    lens = (ctypes.c_long * n)()
    lib.dacs_load_many(c_paths, n, target_sr, int(normalize), n_threads,
                       outs, lens)
    result: list[np.ndarray | None] = []
    for i in range(n):
        if lens[i] < 0:
            result.append(None)
            continue
        arr = np.ctypeslib.as_array(outs[i], shape=(lens[i],)).copy()
        lib.dacs_free(outs[i])
        result.append(arr)
    return result
