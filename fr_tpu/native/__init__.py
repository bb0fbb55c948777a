"""Native (C++) runtime components, loaded via ctypes.

Compiled on demand with g++ into a cached shared library; every entry point
has a numpy fallback so the framework works without a toolchain. The native
surface replaces the reference's third-party native pieces (numba LLVM-JIT
scoring kernels, reference utils/eval.py:68-137) with first-party AOT C++.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).parent
_SRC = _HERE / "fr_native.cpp"
_BUILD = _HERE / "_build"
_LOCK = threading.Lock()
_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

NUM_BINS = 100001


def _compile() -> Optional[Path]:
    so = _BUILD / "libfr_native.so"
    if so.exists() and so.stat().st_mtime >= _SRC.stat().st_mtime:
        return so
    _BUILD.mkdir(exist_ok=True)
    base = ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", str(_SRC), "-o", str(so)]
    # try with the libjpeg decode pool first; fall back to scoring-only
    for extra in (["-DFR_HAVE_JPEG", "-ljpeg"], []):
        try:
            subprocess.run(base + extra, check=True, capture_output=True,
                           timeout=240)
            return so
        except Exception:
            continue
    return None


def load() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("FR_TPU_NO_NATIVE"):
            return None
        so = _compile()
        if so is None:
            return None
        lib = ctypes.CDLL(str(so))
        i64 = ctypes.c_int64
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
        lib.pair_score_f32.argtypes = [f32p, f32p, u8p, i64, i64, f64p, f64p,
                                       f64p]
        lib.cross_score_f32.argtypes = [f32p, i64p, i64, i64, f64p, f64p,
                                        f64p, f64p]
        lib.gather_u8.argtypes = [u8p, i64p, i64, i64, u8p]
        lib.has_jpeg.restype = ctypes.c_int
        lib.decode_jpegs_rgb.argtypes = [u8p, i64p, i64, i64, u8p, u8p]
        lib.decode_jpegs_rgb.restype = i64
        _LIB = lib
        return _LIB


def available() -> bool:
    return load() is not None


def pair_score_native(e1: np.ndarray, e2: np.ndarray, labels: np.ndarray
                      ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    lib = load()
    if lib is None:
        return None
    e1 = np.ascontiguousarray(e1, np.float32)
    e2 = np.ascontiguousarray(e2, np.float32)
    lab = np.ascontiguousarray(labels.astype(bool).astype(np.uint8))
    n, d = e1.shape
    hg = np.zeros(NUM_BINS, np.float64)
    hi = np.zeros(NUM_BINS, np.float64)
    scores = np.zeros(n, np.float64)
    lib.pair_score_f32(e1, e2, lab, n, d, hg, hi, scores)
    return hg, hi, scores


def cross_score_native(emb: np.ndarray, labels: np.ndarray
                       ) -> Optional[Tuple[np.ndarray, np.ndarray,
                                           np.ndarray, np.ndarray]]:
    lib = load()
    if lib is None:
        return None
    emb = np.ascontiguousarray(emb, np.float32)
    lab = np.ascontiguousarray(labels, np.int64)
    n, d = emb.shape
    total = n * (n - 1) // 2
    hg = np.zeros(NUM_BINS, np.float64)
    hi = np.zeros(NUM_BINS, np.float64)
    scores = np.zeros(total, np.float64)
    plab = np.zeros(total, np.float64)
    lib.cross_score_f32(emb, lab, n, d, hg, hi, scores, plab)
    return hg, hi, scores, plab


def jpeg_available() -> bool:
    lib = load()
    return lib is not None and bool(lib.has_jpeg())


def decode_jpegs_native(blobs, out_size: int) -> Optional[np.ndarray]:
    """Threaded libjpeg decode + bilinear resize of a batch of raw JPEG byte
    strings → (n, out_size, out_size, 3) uint8 RGB. None if the native
    decode pool is unavailable or any image failed (caller falls back to
    cv2 per image)."""
    lib = load()
    if lib is None or not lib.has_jpeg():
        return None
    n = len(blobs)
    offsets = np.zeros(n + 1, np.int64)
    for i, b in enumerate(blobs):
        offsets[i + 1] = offsets[i] + len(b)
    blob = np.frombuffer(b"".join(blobs), np.uint8)
    if blob.size == 0:
        return None
    out = np.empty((n, out_size, out_size, 3), np.uint8)
    ok = np.zeros(n, np.uint8)
    n_ok = lib.decode_jpegs_rgb(blob, offsets, n, out_size,
                                out.reshape(n, -1), ok)
    if int(n_ok) != n:
        return None
    return out


def gather_u8_native(images: np.ndarray, index: np.ndarray
                     ) -> Optional[np.ndarray]:
    lib = load()
    if lib is None:
        return None
    images = np.ascontiguousarray(images)
    idx = np.ascontiguousarray(index, np.int64)
    item = int(np.prod(images.shape[1:]))
    out = np.empty((len(idx),) + images.shape[1:], np.uint8)
    lib.gather_u8(images.reshape(len(images), -1), idx, len(idx), item,
                  out.reshape(len(idx), -1))
    return out
