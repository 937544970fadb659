"""Gauss–Legendre quadrature of gridded fields via separable interpolation matmuls.

Capability parity with the reference's integral loss core
(`poisson_CNN/losses/integral_loss.py:121-179`), redesigned for TPU: the reference
performs a per-quad-point neighbour search, gather of 2^ndims corner values and a
batched small `tf.linalg.solve` per point. On a regular grid with normalized
coordinates, multilinear interpolation onto a FIXED set of quadrature points is a
separable linear map — one small dense matrix per axis, applied as matmuls (MXU)
with no gathers or solves. The matrices are precomputed with numpy at trace time
(shapes are static under jit).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def gauss_legendre(n: int):
    """Quadrature nodes/weights on [-1, 1] (numpy, cached)."""
    x, w = np.polynomial.legendre.leggauss(n)
    return x.astype(np.float64), w.astype(np.float64)


@lru_cache(maxsize=None)
def linear_interp_matrix(n_grid: int, n_quad: int) -> np.ndarray:
    """(n_quad, n_grid) matrix mapping values on linspace(-1,1,n_grid) to values at
    the n_quad Gauss–Legendre nodes by linear interpolation. Two nonzeros per row;
    kept dense because n_quad, n_grid are small and dense matmul rides the MXU."""
    q, _ = gauss_legendre(n_quad)
    h = 2.0 / (n_grid - 1)
    lo = np.floor((q + 1.0) / h).astype(np.int64)
    lo = np.clip(lo, 0, n_grid - 2)
    g_lo = -1.0 + lo * h
    t = (q - g_lo) / h
    mat = np.zeros((n_quad, n_grid), dtype=np.float64)
    mat[np.arange(n_quad), lo] = 1.0 - t
    mat[np.arange(n_quad), lo + 1] = t
    return mat


def integrate_on_grid(fields: jax.Array, domain_sizes: jax.Array, n_quadpts) -> jax.Array:
    """Approximate integral of each sample/channel of `fields` over its physical
    domain using GL quadrature of the multilinearly-interpolated field.

    fields: (B, *spatial, C) sampled on uniform grids spanning [0, L_k] per axis.
    domain_sizes: (B, ndims) physical sizes L_k per sample.
    n_quadpts: int or per-axis list.
    Returns (B, C).
    """
    nd = fields.ndim - 2
    if isinstance(n_quadpts, int):
        n_quadpts = [n_quadpts] * nd
    dtype = fields.dtype
    out = fields
    # Interpolate axis by axis: each step contracts one spatial axis to n_quad.
    for k in range(nd):
        n_grid = out.shape[1 + k]
        q_mat = jnp.asarray(linear_interp_matrix(n_grid, n_quadpts[k]), dtype=dtype)
        out = jnp.moveaxis(
            jnp.tensordot(q_mat, out, axes=[[1], [1 + k]]), 0, 1 + k
        )
    # Tensor-product weights.
    for k in range(nd):
        _, w = gauss_legendre(n_quadpts[k])
        w = jnp.asarray(w, dtype=dtype).reshape(
            (1,) + (1,) * k + (-1,) + (1,) * (nd - k - 1) + (1,)
        )
        out = out * w
    total = jnp.sum(out, axis=tuple(range(1, nd + 1)))  # (B, C)
    # Map [-1,1]^nd reference cell to [0,L]^nd: jacobian = prod(L_k / 2).
    jac = jnp.prod(domain_sizes.astype(dtype) / 2.0, axis=-1)
    return total * jac[:, None]


def integral_lp_error(
    y_true: jax.Array, y_pred: jax.Array, domain_sizes: jax.Array,
    n_quadpts, p: int = 2,
) -> jax.Array:
    """Continuous L^p error integral per sample/channel: ∫ (y_true - y_pred)^p dV,
    with the p-th power taken on the grid before interpolation, matching the
    reference (`integral_loss.py` docstring & `:121-179`). Returns (B, C)."""
    err = (y_true - y_pred) ** p
    return integrate_on_grid(err, domain_sizes, n_quadpts)
