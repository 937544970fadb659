"""Random smooth-function synthesis from truncated Fourier series — on-device.

Capability parity with `poisson_CNN/dataset/utils/generate_smooth_function.py:5-84`:
fields are truncated sine/cosine series sampled on [0, pi]^ndims grids,
- 'dirichlet' (homogeneous_bc): sine-only products  -> zero on the boundary,
- 'neumann' (homogeneous_neumann_bc): cosine-only   -> zero normal derivative,
- 'mixed': sum of a sine-product series and a cosine-product series.

TPU-first design: the whole batch is synthesized with per-axis basis matmuls
(MXU) instead of the reference's per-sample tf.map_fn einsums. Per-sample random
mode counts are realised by zero-masking coefficients beyond each sample's count
(static max-mode shape under jit).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def trig_bases(grid_shape, max_modes, dtype=jnp.float32):
    """Per-axis sine and cosine basis matrices.

    Returns lists [S_k], [C_k] with S_k, C_k of shape (max_modes[k], n_k):
    S_k[m, i] = sin((m+1) * x_i), x = linspace(0, pi, n_k).
    """
    sins, coss = [], []
    for n, m in zip(grid_shape, max_modes):
        x = jnp.linspace(0.0, math.pi, n, dtype=dtype)
        modes = jnp.arange(1, m + 1, dtype=dtype)
        arg = modes[:, None] * x[None, :]
        sins.append(jnp.sin(arg))
        coss.append(jnp.cos(arg))
    return sins, coss


def _contract(coeffs: jax.Array, bases) -> jax.Array:
    """coeffs: (B, M_0, ..., M_{d-1}); bases: list of (M_k, n_k). Returns (B, n_0, ...)."""
    out = coeffs
    for k, b in enumerate(bases):
        out = jnp.moveaxis(jnp.tensordot(out, b, axes=[[1 + k], [0]]), -1, 1 + k)
    return out


def random_series_coefficients(
    key: jax.Array, batch_size: int, max_modes, n_modes: jax.Array | None = None,
    dtype=jnp.float32,
) -> jax.Array:
    """Uniform[-1,1] coefficients (B, *max_modes), zero-masked beyond each sample's
    per-axis mode count n_modes (B, ndims) when given."""
    nd = len(max_modes)
    c = jax.random.uniform(
        key, (batch_size,) + tuple(max_modes), dtype=dtype, minval=-1.0, maxval=1.0
    )
    if n_modes is not None:
        for k, m in enumerate(max_modes):
            idx = jax.lax.broadcasted_iota(jnp.int32, (1, m), 1)
            mask = (idx < n_modes[:, k : k + 1]).astype(dtype)  # (B, m)
            mask = mask.reshape((batch_size,) + (1,) * k + (m,) + (1,) * (nd - k - 1))
            c = c * mask
    return c


def synthesize_series(
    sin_coeffs: jax.Array | None,
    cos_coeffs: jax.Array | None,
    grid_shape,
    dtype=jnp.float32,
) -> jax.Array:
    """Evaluate sin-product + cos-product series on the grid. Returns (B, *grid_shape)."""
    max_modes = (sin_coeffs if sin_coeffs is not None else cos_coeffs).shape[1:]
    sins, coss = trig_bases(grid_shape, max_modes, dtype=dtype)
    out = None
    if sin_coeffs is not None:
        out = _contract(sin_coeffs, sins)
    if cos_coeffs is not None:
        c = _contract(cos_coeffs, coss)
        out = c if out is None else out + c
    return out


def laplacian_eigenvalue_factors(
    domain_sizes: jax.Array, max_modes, dtype=jnp.float32
) -> jax.Array:
    """Per-sample RHS coefficient adjustment: -sum_k ((m_k * pi) / L_k)^2.

    For solutions built from products of sin(m_k * pi * x/L_k) (or cos), the
    Laplacian multiplies each mode's coefficient by this factor — the reference
    derives RHS coefficients the same way (`dataset/generators/reverse.py:200-223`).
    NOTE: the reference uses L = dx*n there while its grids span dx*(n-1); we use
    the consistent L = dx*(n-1) so the FD physics residual actually vanishes.

    domain_sizes: (B, ndims). Returns (B, *max_modes).
    """
    nd = len(max_modes)
    out = None
    for k, m in enumerate(max_modes):
        modes = jnp.arange(1, m + 1, dtype=dtype) * math.pi  # (m,)
        term = (modes[None, :] / domain_sizes[:, k : k + 1]) ** 2  # (B, m)
        term = term.reshape((-1,) + (1,) * k + (m,) + (1,) * (nd - k - 1))
        out = term if out is None else out + term
    return -out
