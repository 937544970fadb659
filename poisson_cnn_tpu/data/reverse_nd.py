"""N-dimensional reverse-mode data generation (1/2/3-D).

The reference's generators support 1-3 spatial dimensions
(`poisson_CNN/dataset/generators/reverse.py` takes `ndims`); the 2-D path here
lives in `data.reverse` (full feature set: AR-uniform grids, Taylor component,
boundary extraction). This module provides the N-D capability with the Fourier
component (sine/cosine series + analytic RHS) for any dimensionality — the
polynomial component and AR machinery remain 2-D specialisations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import (
    compute_domain_sizes,
    laplacian_eigenvalue_factors,
    random_series_coefficients,
    set_max_magnitude_in_batch_and_return_scaling_factors,
    synthesize_series,
)


@dataclasses.dataclass(frozen=True)
class ReverseNDConfig:
    batch_size: int
    dx_range: Tuple[float, float] = (5e-3, 5e-2)
    fourier_mode_range: Tuple[int, int] = (1, 6)
    bc: str = "dirichlet"  # 'dirichlet' | 'neumann' | 'mixed'
    rhs_max_magnitude: float | None = 1.0

    def __post_init__(self):
        if self.bc not in ("dirichlet", "neumann", "mixed"):
            raise ValueError(f"unknown bc {self.bc}")


@partial(jax.jit, static_argnums=(1, 2))
def generate_batch_nd(key: jax.Array, cfg: ReverseNDConfig, grid_shape: Tuple[int, ...]):
    """Batch dict {'rhs', 'soln', 'dx'} for any static grid_shape (1-3+ dims)."""
    B = cfg.batch_size
    nd = len(grid_shape)
    k_dx, k_modes, k_sin, k_cos = jax.random.split(key, 4)
    dx = jax.random.uniform(
        k_dx, (B, nd), minval=cfg.dx_range[0], maxval=cfg.dx_range[1]
    )
    L = compute_domain_sizes(dx, grid_shape)
    m_lo, m_hi = cfg.fourier_mode_range
    max_modes = (m_hi,) * nd
    n_modes = jax.random.randint(k_modes, (B, nd), m_lo, m_hi + 1)
    eig = laplacian_eigenvalue_factors(L, max_modes)
    sin_c = cos_c = None
    if cfg.bc in ("dirichlet", "mixed"):
        sin_c = random_series_coefficients(k_sin, B, max_modes, n_modes=n_modes)
    if cfg.bc in ("neumann", "mixed"):
        cos_c = random_series_coefficients(k_cos, B, max_modes, n_modes=n_modes)
    soln = synthesize_series(sin_c, cos_c, grid_shape)[..., None]
    rhs = synthesize_series(
        None if sin_c is None else sin_c * eig,
        None if cos_c is None else cos_c * eig,
        grid_shape,
    )[..., None]
    if cfg.rhs_max_magnitude is not None:
        rhs, factors = set_max_magnitude_in_batch_and_return_scaling_factors(
            rhs, cfg.rhs_max_magnitude
        )
        soln = soln * factors.reshape((-1,) + (1,) * (nd + 1))
    return {"rhs": rhs, "soln": soln, "dx": dx}
