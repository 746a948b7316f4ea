"""Native host runtime (C++ data engine) with transparent NumPy fallback.

The TPU compute path is JAX/Pallas; this package natively accelerates the
host-side data layer — the role the reference fills with CUDA + host
NumPy (``/root/reference/src/dataset/tigre.py:354-361``,
``/root/reference/src/utils/util.py:196-205``):

- ``ptycho_mask_batch``: beam masks for all views
- ``build_pools``: static-shaped valid-pixel index pools

Public API always works; ``available()`` reports whether the C++ path is
active.  Set ``NVR_DISABLE_NATIVE=1`` to force the NumPy fallback.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("NVR_DISABLE_NATIVE") == "1":
        return None
    try:
        from .build import build

        lib = ctypes.CDLL(build())
        i64, i32p, f32p, u8p = (
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8),
        )
        lib.nvr_ptycho_mask_batch.argtypes = [f32p, i64, i64, i64,
                                              ctypes.c_float, u8p]
        lib.nvr_ptycho_mask_batch.restype = None
        lib.nvr_pool_counts_max.argtypes = [f32p, i64, i64, i32p]
        lib.nvr_pool_counts_max.restype = ctypes.c_int32
        lib.nvr_fill_pools.argtypes = [f32p, i64, i64, i64, i32p, i32p]
        lib.nvr_fill_pools.restype = None
        lib.nvr_version.restype = ctypes.c_int32
        assert lib.nvr_version() == 1
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def _i32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _u8p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def ptycho_mask_batch(full_proj: np.ndarray, threshold: float = 0.007
                      ) -> np.ndarray:
    """Beam masks [N, H, W] float32 (1 = keep) from (complex) projections.

    Semantics of ``metrics.get_ptycho_mask`` (util.py:196-205) per view.
    """
    fp = np.asarray(full_proj)
    if fp.ndim == 2:
        fp = fp[None]
    mag = np.ascontiguousarray(np.abs(fp), np.float32)
    n, h, w = mag.shape
    lib = _load()
    if lib is None:
        from ..metrics import get_ptycho_mask

        return np.stack([
            get_ptycho_mask(mag[i], threshold).astype(np.float32)
            for i in range(n)
        ])
    out = np.empty((n, h, w), np.uint8)
    lib.nvr_ptycho_mask_batch(_f32p(mag), n, h, w,
                              ctypes.c_float(threshold), _u8p(out))
    return out.astype(np.float32)


def build_pools(projs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-view valid-pixel pools (|proj| > 0) padded by cyclic repetition.

    Returns (pools [N, P] int32, counts [N] int32); all-invalid views fall
    back to the full pixel set.  Mirrors ``data.dataset._build_pools``.
    """
    p = np.ascontiguousarray(np.asarray(projs, np.float32))
    n, h, w = p.shape
    hw = h * w
    lib = _load()
    if lib is None:
        return _build_pools_numpy(p)
    counts = np.empty((n,), np.int32)
    mx = int(lib.nvr_pool_counts_max(_f32p(p), n, hw, _i32p(counts)))
    # all-invalid views fall back to the full pixel set, so the padded
    # pool length becomes hw (matching _build_pools_numpy)
    pool_len = hw if (counts == 0).any() else max(mx, 1)
    pools = np.empty((n, pool_len), np.int32)
    lib.nvr_fill_pools(_f32p(p), n, hw, pool_len, _i32p(pools),
                       _i32p(counts))
    return pools, counts


def _build_pools_numpy(projs: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    n, h, w = projs.shape
    flat = np.abs(projs.reshape(n, -1)) > 0
    counts = flat.sum(axis=1)
    if (counts == 0).any():
        flat[counts == 0] = True
        counts = flat.sum(axis=1)
    pool_len = int(counts.max())
    pools = np.zeros((n, pool_len), np.int32)
    for i in range(n):
        idx = np.flatnonzero(flat[i]).astype(np.int32)
        reps = int(np.ceil(pool_len / idx.size))
        pools[i] = np.tile(idx, reps)[:pool_len]
    return pools, counts.astype(np.int32)
