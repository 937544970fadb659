"""Native (C++) host-side solvers with ctypes bindings.

The reference gets its native ground-truth solver from external C++ (pyamg's
Ruge–Stüben AMG / NVIDIA AMGX, `poisson_CNN/dataset/solvers/multigrid.py`).
This package builds an in-tree C++ geometric-multigrid Poisson solver as the
equivalent host-side oracle — used for cross-validating the on-device solvers
and as a CPU ground-truth fallback when no accelerator is available. Built
lazily with g++; everything degrades gracefully if no toolchain exists.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from functools import lru_cache
from typing import Optional

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "poisson_mg.cpp")
_LIB = os.path.join(os.path.dirname(__file__), "libpoisson_mg.so")


def build(force: bool = False) -> Optional[str]:
    """Compile the shared library (g++ -O3). Returns the path or None."""
    if os.path.exists(_LIB) and not force:
        if os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
            return _LIB
    try:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
            check=True, capture_output=True,
        )
        return _LIB
    except (OSError, subprocess.CalledProcessError):
        return None


@lru_cache(maxsize=1)
def _load():
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    lib.solve_poisson_2d.restype = ctypes.c_int
    lib.solve_poisson_2d.argtypes = [
        ctypes.POINTER(ctypes.c_double),
        ctypes.POINTER(ctypes.c_double),
        ctypes.c_int,
        ctypes.c_int,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_double,
        ctypes.c_int,
    ]
    return lib


def available() -> bool:
    return _load() is not None


def multigrid_poisson_solve_host(
    rhs: np.ndarray,
    dx,
    tol: float = 1e-10,
    max_cycles: int = 100,
    x0: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Solve lap(u) = rhs with homogeneous Dirichlet BCs on the host.

    rhs: (n0, n1) or batched (B, n0, n1[, 1]); dx: scalar, (2,) or per-sample
    (B, 2). Same tol semantics as the reference's pyamg call (tol 1e-10,
    `multigrid.py:98`). Returns u with the same shape as rhs.
    """
    lib = _load()
    if lib is None:
        raise RuntimeError("native solver unavailable (no g++?)")
    arr = np.asarray(rhs, dtype=np.float64)
    squeeze_channel = arr.ndim >= 3 and arr.shape[-1] == 1
    if squeeze_channel:
        arr = arr[..., 0]
    batched = arr.ndim == 3
    batch = arr if batched else arr[None]
    dx = np.asarray(dx, dtype=np.float64)
    if dx.ndim == 0:
        dx = np.tile(dx, (batch.shape[0], 2))
    elif dx.ndim == 1:
        dx = np.tile(dx[None], (batch.shape[0], 1))
    if dx.shape[-1] == 1:
        dx = np.tile(dx, (1, 2))
    out = np.zeros_like(batch)
    if x0 is not None:
        x0a = np.asarray(x0, dtype=np.float64)
        if squeeze_channel:
            x0a = x0a[..., 0]
        out[...] = x0a if batched else x0a[None]
    for b in range(batch.shape[0]):
        f = np.ascontiguousarray(batch[b])
        u = np.ascontiguousarray(out[b])
        rc = lib.solve_poisson_2d(
            f.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            u.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            f.shape[0], f.shape[1],
            float(dx[b, 0]), float(dx[b, 1]),
            tol, max_cycles,
        )
        if rc < 0:
            raise ValueError(f"grid too small for native multigrid: {f.shape}")
        out[b] = u
    result = out if batched else out[0]
    if squeeze_channel:
        result = result[..., None]
    return result
