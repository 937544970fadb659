"""Analytical (exact-eigenfunction) Poisson dataset.

Capability parity with `poisson_CNN/dataset/generators/analytical.py:57-218`:
solutions and RHS as sine-eigenfunction series on [0, L_1] x ... x [0, L_n]
with homogeneous Dirichlet BCs.
- 'random' mode: RHS coefficients A_m uniform[-1,1] scaled by the reference's
  exp(-sum(m)) smoothness decay; exact solution coefficients
  a_m = -A_m / sum_k((m_k pi / L_k)^2)  (the Wikiversity 4-homogeneous-BC
  formula the reference cites).
- callable mode: project an arbitrary RHS callable onto the sine modes by
  Gauss-Legendre quadrature (the reference uses a multiprocessing thread pool +
  per-mode integrator, `analytical.py:103-118`; here the projection is a single
  quadrature-grid evaluation + basis matmuls, on-device).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Callable, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import (
    gauss_legendre,
    laplacian_eigenvalue_factors,
    set_max_magnitude_in_batch_and_return_scaling_factors,
    synthesize_series,
)


@dataclasses.dataclass(frozen=True)
class AnalyticalConfig:
    batch_size: int = 16
    output_shape: Tuple[int, int] = (64, 64)
    n_modes: Tuple[int, int] = (16, 16)
    domain: Tuple[float, float] = (1.0, 1.0)
    max_magnitude: Optional[float] = None  # scale rhs peak to this if set
    smoothness_decay: bool = True  # exp(-(m_0 + m_1)) coefficient decay


@partial(jax.jit, static_argnums=(1,))
def generate_analytical_batch(key: jax.Array, cfg: AnalyticalConfig):
    """Random-mode batch: dict with 'rhs', 'soln', 'dx' — exact solution pairs."""
    B = cfg.batch_size
    m0, m1 = cfg.n_modes
    L = jnp.asarray(cfg.domain)
    coeffs = jax.random.uniform(
        key, (B, m0, m1), minval=-1.0, maxval=1.0
    )
    if cfg.smoothness_decay:
        modes0 = jnp.arange(m0)[:, None]
        modes1 = jnp.arange(m1)[None, :]
        coeffs = coeffs * jnp.exp(-(modes0 + modes1).astype(coeffs.dtype))
    Lb = jnp.broadcast_to(L[None], (B, 2))
    eig = laplacian_eigenvalue_factors(Lb, cfg.n_modes)  # -(m pi / L)^2 sums
    soln_coeffs = coeffs / eig
    rhs = synthesize_series(coeffs, None, cfg.output_shape)[..., None]
    soln = synthesize_series(soln_coeffs, None, cfg.output_shape)[..., None]
    if cfg.max_magnitude is not None:
        rhs, factors = set_max_magnitude_in_batch_and_return_scaling_factors(
            rhs, cfg.max_magnitude
        )
        soln = soln * factors[:, None, None, None]
    dx = jnp.broadcast_to(
        (L / (jnp.asarray(cfg.output_shape, dtype=L.dtype) - 1.0))[None], (B, 2)
    )
    return {"rhs": rhs, "soln": soln, "dx": dx}


def analytical_solution_for_rhs(
    rhs_fn: Callable, cfg: AnalyticalConfig, n_quad: int = 64
):
    """Callable-RHS mode: project rhs_fn(x, y) onto the sine modes by GL
    quadrature and synthesize the exact solution.

    Returns (rhs_grid (H, W, 1), soln_grid (H, W, 1)).
    """
    Lx, Ly = cfg.domain
    m0, m1 = cfg.n_modes
    qx, wx = gauss_legendre(n_quad)
    qy, wy = gauss_legendre(n_quad)
    # map [-1,1] -> [0,L]
    x = jnp.asarray((qx + 1.0) * Lx / 2.0)
    y = jnp.asarray((qy + 1.0) * Ly / 2.0)
    wx = jnp.asarray(wx) * Lx / 2.0
    wy = jnp.asarray(wy) * Ly / 2.0
    f = rhs_fn(x[:, None], y[None, :])  # (nq, nq)
    # mode coefficients: A_m = (2/Lx)(2/Ly) * integral f sin sin
    sx = jnp.sin(jnp.arange(1, m0 + 1)[:, None] * math.pi * x[None, :] / Lx)  # (m0, nq)
    sy = jnp.sin(jnp.arange(1, m1 + 1)[:, None] * math.pi * y[None, :] / Ly)
    proj = jnp.einsum("mi,ij,nj,i,j->mn", sx, f, sy, wx, wy)
    coeffs = proj * (2.0 / Lx) * (2.0 / Ly)
    L = jnp.asarray(cfg.domain)
    eig = laplacian_eigenvalue_factors(L[None], cfg.n_modes)[0]
    soln_coeffs = coeffs / eig
    rhs_grid = synthesize_series(coeffs[None], None, cfg.output_shape)[0, ..., None]
    soln_grid = synthesize_series(soln_coeffs[None], None, cfg.output_shape)[0, ..., None]
    return rhs_grid, soln_grid
