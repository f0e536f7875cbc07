"""ctypes bindings for the native data ops, with lazy compilation.

On first import, tries (in order): a prebuilt ``libmhrec_native.so`` next to
this file, then compiling ``mhrec_native.cpp`` with the system ``g++``
(``-O3 -fopenmp -shared -fPIC``). If neither works, ``lib`` is None and the
pure-numpy sampler paths are used — behavior is identical either way.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

logger = logging.getLogger(__name__)

_DIR = os.path.dirname(__file__)
_SO = os.path.join(_DIR, "libmhrec_native.so")
_SRC = os.path.join(_DIR, "mhrec_native.cpp")

lib = None


def _try_load():
    global lib
    if os.path.isfile(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        try:
            lib = ctypes.CDLL(_SO)
            return True
        except OSError:
            pass
    return False


def _try_build():
    try:
        subprocess.run(
            ["g++", "-O3", "-fopenmp", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return _try_load()
    except Exception as e:
        logger.debug("native build failed: %s", e)
        return False


if not _try_load():
    _try_build()

if lib is not None:
    _i64p = ctypes.POINTER(ctypes.c_int64)
    _f64p = ctypes.POINTER(ctypes.c_double)
    lib.sample_negatives_uniform.argtypes = [
        _i64p, ctypes.c_int64, ctypes.c_int64, _i64p, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_uint64,
    ]
    lib.sample_negatives_pool.argtypes = [
        _i64p, ctypes.c_int64, ctypes.c_int64, _i64p, ctypes.c_int64,
        _i64p, ctypes.c_int64, ctypes.c_uint64,
    ]
    lib.sample_negatives_weighted.argtypes = [
        _i64p, ctypes.c_int64, ctypes.c_int64, _i64p, ctypes.c_int64,
        _i64p, _f64p, ctypes.c_int64, ctypes.c_uint64,
    ]


def _ptr(a, ctype=ctypes.c_int64):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def available() -> bool:
    return lib is not None


def sample_negatives_uniform(blacklist: np.ndarray, k: int, item_num: int,
                             seed: int) -> np.ndarray:
    B, Lb = blacklist.shape
    bl = np.ascontiguousarray(blacklist, dtype=np.int64)
    out = np.empty((B, k), dtype=np.int64)
    lib.sample_negatives_uniform(
        _ptr(out), B, k, _ptr(bl), Lb, item_num, seed & 0xFFFFFFFFFFFFFFFF
    )
    return out


def sample_negatives_pool(blacklist: np.ndarray, k: int, pool: np.ndarray,
                          seed: int) -> np.ndarray:
    B, Lb = blacklist.shape
    bl = np.ascontiguousarray(blacklist, dtype=np.int64)
    p = np.ascontiguousarray(pool, dtype=np.int64)
    out = np.empty((B, k), dtype=np.int64)
    lib.sample_negatives_pool(
        _ptr(out), B, k, _ptr(bl), Lb, _ptr(p), len(p), seed & 0xFFFFFFFFFFFFFFFF
    )
    return out


def sample_negatives_weighted(blacklist: np.ndarray, k: int, pool: np.ndarray,
                              cdf: np.ndarray, seed: int) -> np.ndarray:
    B, Lb = blacklist.shape
    bl = np.ascontiguousarray(blacklist, dtype=np.int64)
    p = np.ascontiguousarray(pool, dtype=np.int64)
    c = np.ascontiguousarray(cdf, dtype=np.float64)
    out = np.empty((B, k), dtype=np.int64)
    lib.sample_negatives_weighted(
        _ptr(out), B, k, _ptr(bl), Lb, _ptr(p), _ptr(c, ctypes.c_double),
        len(p), seed & 0xFFFFFFFFFFFFFFFF,
    )
    return out

