"""Native host-side kernels, compiled on demand with g++ and loaded via
ctypes (no pybind11 in the image). Falls back to pure python when no
toolchain is available; ``available()`` reports which path is active.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path

import numpy as np

_SRC = Path(__file__).parent / "levenshtein.cpp"
_LIB = None
_TRIED = False


def _build() -> ctypes.CDLL | None:
    src = _SRC.read_text()
    tag = hashlib.sha1(src.encode()).hexdigest()[:12]
    cache = Path(os.environ.get("ISHARA_NATIVE_CACHE",
                                tempfile.gettempdir())) / "ishara_native"
    cache.mkdir(parents=True, exist_ok=True)
    so = cache / f"levenshtein_{tag}.so"
    try:
        if not so.exists():
            # unique tmp per process: concurrent builders each write their
            # own file; the rename into place is atomic
            tmp = so.with_suffix(f".so.tmp.{os.getpid()}")
            cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17",
                   str(_SRC), "-o", str(tmp)]
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            tmp.rename(so)
        lib = ctypes.CDLL(str(so))
        lib.batch_levenshtein.restype = None
        lib.batch_levenshtein.argtypes = [
            ctypes.POINTER(ctypes.c_int32)] * 4 + [
            ctypes.c_int32] * 3 + [ctypes.POINTER(ctypes.c_int32)]
        return lib
    except Exception:
        # any failure (toolchain missing, corrupt cached .so) -> python DP
        return None


def _lib() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    if not _TRIED:
        _TRIED = True
        _LIB = _build()
    return _LIB


def available() -> bool:
    return _lib() is not None


def batch_levenshtein(preds: list[str], targets: list[str]) -> np.ndarray:
    """Vector of edit distances. Native when the toolchain permits,
    otherwise the pure-python DP."""
    lib = _lib()
    if lib is None:
        from ..evaluation.metrics import levenshtein

        return np.asarray([levenshtein(p, t) for p, t in zip(preds, targets)],
                          np.int32)
    B = len(preds)
    na = max((len(p) for p in preds), default=0) or 1
    nb = max((len(t) for t in targets), default=0) or 1
    a = np.zeros((B, na), np.int32)
    b = np.zeros((B, nb), np.int32)
    la = np.asarray([len(p) for p in preds], np.int32)
    lb = np.asarray([len(t) for t in targets], np.int32)
    for i, (p, t) in enumerate(zip(preds, targets)):
        a[i, : len(p)] = np.frombuffer(
            p.encode("utf-32-le"), np.uint32).astype(np.int32)
        b[i, : len(t)] = np.frombuffer(
            t.encode("utf-32-le"), np.uint32).astype(np.int32)
    out = np.zeros((B,), np.int32)
    i32p = lambda x: x.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    lib.batch_levenshtein(i32p(a), i32p(b), i32p(la), i32p(lb),
                          B, na, nb, i32p(out))
    return out
