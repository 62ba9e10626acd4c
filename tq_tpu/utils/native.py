"""ctypes bindings for the native tr_oracle library.

Builds ``native/libtr_oracle.so`` on demand (make, cached) and exposes
the exact-reference-semantics term reveal as NumPy functions.  Used as
the scale-capable golden model in tests; the hot path stays on TPU.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_ROOT = Path(__file__).resolve().parents[2]
_LIB_PATH = _ROOT / "native" / "build" / "libtr_oracle.so"
_lib = None


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        subprocess.run(
            ["make", "-C", str(_ROOT / "native")],
            check=True,
            capture_output=True,
        )
    _lib = ctypes.CDLL(str(_LIB_PATH))
    _lib.tr_reveal.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
        ctypes.c_float,
        ctypes.c_int,
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    _lib.hese_term_counts.argtypes = [
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int,
    ]
    return _lib


def tr_reveal_native(
    x: np.ndarray, sf: float, bits: int, group_size: int, num_keep_terms: int
) -> np.ndarray:
    """Reference-semantics term reveal over the last axis (native)."""
    lib = _load()
    x = np.ascontiguousarray(x, np.float32)
    flat = x.reshape(-1, x.shape[-1])
    out = np.empty_like(flat)
    for r in range(flat.shape[0]):
        xi = np.ascontiguousarray(flat[r])
        oi = np.empty_like(xi)
        lib.tr_reveal(
            xi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            oi.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            xi.size,
            ctypes.c_float(sf),
            bits,
            group_size,
            num_keep_terms,
        )
        out[r] = oi
    return out.reshape(x.shape)


def hese_term_counts_native(q: np.ndarray, bits: int) -> np.ndarray:
    lib = _load()
    q = np.ascontiguousarray(q, np.int64).reshape(-1)
    counts = np.empty_like(q)
    lib.hese_term_counts(
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        q.size,
        bits,
    )
    return counts
