"""Align-corners separable resize via per-axis interpolation matmuls.

Replaces the reference's `tf.image.resize` / tfp `batch_interp_regular_nd_grid`
usage (`poisson_CNN/layers/Upsample.py:31-61`, `dataset/utils/image_resize.py`).
On uniform grids with endpoint-aligned sampling (the reference's convention:
coordinates linspace over [0, L]) resampling is a fixed linear map per axis, so
we precompute small dense (n_out, n_in) matrices with numpy (shapes are static
under jit) and contract them — MXU matmuls instead of gather-based resizes.

Methods: 'nearest', 'bilinear' (linear per axis), 'bicubic' (Catmull-Rom per
axis, clamped edges), 'bicubic_tf' (Keys cubic with a=-0.75 — the kernel
`tf.image.resize`'s BICUBIC uses, for users who need bit-comparable outputs
with the reference's resize; TF quantizes its kernel table to 1000 bins, so
agreement is ~1e-3, verified in tests/test_reference_parity.py).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def resize_matrix(n_in: int, n_out: int, method: str = "bilinear") -> np.ndarray:
    """(n_out, n_in) align-corners interpolation matrix."""
    if n_in == 1:
        return np.ones((n_out, 1))
    if n_out == 1:
        out = np.zeros((1, n_in))
        out[0, 0] = 1.0
        return out
    x = np.linspace(0.0, n_in - 1.0, n_out)
    mat = np.zeros((n_out, n_in))
    if method == "nearest":
        idx = np.round(x).astype(int)
        mat[np.arange(n_out), idx] = 1.0
        return mat
    lo = np.clip(np.floor(x).astype(int), 0, n_in - 2)
    t = x - lo
    if method in ("bilinear", "linear", "multilinear"):
        mat[np.arange(n_out), lo] = 1.0 - t
        mat[np.arange(n_out), lo + 1] = t
        return mat
    if method in ("bicubic", "bicubic_tf"):
        # Keys cubic (a=-0.5 is Catmull-Rom, the default; a=-0.75 is the
        # tf.image.resize kernel) with clamped out-of-range taps
        a = -0.5 if method == "bicubic" else -0.75

        def keys(s):
            s = np.abs(s)
            return np.where(
                s <= 1,
                (a + 2) * s**3 - (a + 3) * s**2 + 1,
                np.where(s < 2, a * (s**3 - 5 * s**2 + 8 * s - 4), 0.0),
            )

        for off in (-1, 0, 1, 2):
            idx = np.clip(lo + off, 0, n_in - 1)
            np.add.at(mat, (np.arange(n_out), idx), keys(t - off))
        return mat
    raise ValueError(f"unknown resize method {method}")


def resize_align_corners(x: jax.Array, out_shape, method: str = "bilinear") -> jax.Array:
    """Resize the spatial dims of (B, *spatial, C) to `out_shape` (static)."""
    nd = x.ndim - 2
    assert len(out_shape) == nd
    out = x
    for k in range(nd):
        m = jnp.asarray(
            resize_matrix(x.shape[1 + k], int(out_shape[k]), method), dtype=x.dtype
        )
        out = jnp.moveaxis(jnp.tensordot(m, out, axes=[[1], [1 + k]]), 0, 1 + k)
    return out
