"""ctypes bindings for the native host library, with lazy build.

Python fallbacks exist for every native function (frontend/audio.py,
decode/context_graph.py, pure-python edit distance); the native versions
are drop-in faster paths for host-bound work (bulk resampling, per-symbol
bias stepping inside beam search, WER over large corpora).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "build", "libasr2native.so")
_lib = None
_tried = False


def _load():
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_SO):
        try:
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    lib.a2p_resample.restype = ctypes.c_int64
    lib.a2p_resample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.a2p_ac_build.restype = ctypes.c_void_p
    lib.a2p_ac_build.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32]
    lib.a2p_ac_free.argtypes = [ctypes.c_void_p]
    lib.a2p_ac_step.restype = ctypes.c_float
    lib.a2p_ac_step.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.c_int32]
    lib.a2p_ac_final.restype = ctypes.c_float
    lib.a2p_ac_final.argtypes = [ctypes.c_void_p, ctypes.c_int32]
    lib.a2p_edit_align.restype = ctypes.c_int64
    lib.a2p_edit_align.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32)]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def resample(x: np.ndarray, fs_in: int, fs_out: int,
             num_zeros: int = 6) -> Optional[np.ndarray]:
    lib = _load()
    if lib is None:
        return None
    x = np.ascontiguousarray(x, dtype=np.float32)
    n_out = int(np.ceil(len(x) * fs_out / fs_in)) + 16
    out = np.empty(n_out, np.float32)
    n = lib.a2p_resample(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        fs_in, fs_out, num_zeros,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)))
    return out[:n]


class NativeAcBias:
    """Aho-Corasick bias automaton over int32 symbol ids (bias-lm.cpp
    role). States are plain ints; step returns the score delta."""

    def __init__(self, words: List[List[int]], scores: List[float]):
        lib = _load()
        if lib is None:
            raise RuntimeError("native lib unavailable")
        self._lib = lib
        flat = np.asarray([s for w in words for s in w], np.int32)
        lens = np.asarray([len(w) for w in words], np.int32)
        sc = np.asarray(scores, np.float32)
        self._handle = lib.a2p_ac_build(
            flat.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            lens.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            sc.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(words))

    def step(self, state: int, symbol: int) -> Tuple[int, float]:
        s = ctypes.c_int32(state)
        delta = self._lib.a2p_ac_step(self._handle, ctypes.byref(s), symbol)
        return s.value, float(delta)

    def final(self, state: int) -> float:
        return float(self._lib.a2p_ac_final(self._handle, state))

    def __del__(self):
        if getattr(self, "_handle", None) and self._lib:
            self._lib.a2p_ac_free(self._handle)


def edit_align(a: List[int], b: List[int]
               ) -> Optional[Tuple[List[int], int]]:
    """Returns (ops, distance); ops: 0=match 1=sub 2=del 3=ins."""
    lib = _load()
    if lib is None:
        return None
    aa = np.asarray(a, np.int32)
    bb = np.asarray(b, np.int32)
    ops = np.empty(len(a) + len(b) + 1, np.int32)
    dist = ctypes.c_int32(0)
    n = lib.a2p_edit_align(
        aa.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(aa),
        bb.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(bb),
        ops.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.byref(dist))
    return [int(o) for o in ops[:n]], int(dist.value)
