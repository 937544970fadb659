"""Reverse-mode Poisson training-data engine: synthesize solution, derive RHS.

Capability parity with `poisson_CNN/dataset/generators/reverse.py:101-330` and its
Neumann subclass (`reverse_neumann.py:9-66`): each batch is a random grid shape +
per-sample spacings with uniformly-distributed aspect ratios; the solution is a
random truncated Fourier series (sine-only for homogeneous Dirichlet, cosine-only
for homogeneous Neumann, sine+cosine otherwise) plus a random product-polynomial
("Taylor") component; the RHS is derived *analytically* (eigenvalue scaling for
the Fourier part, exact polynomial differentiation for the Taylor part); the
Taylor component is rescaled so its RHS peak matches the Fourier RHS peak; then
the configured normalizations are applied (rhs-max-magnitude, soln-max-magnitude,
1/max-domain-size^2).

TPU-first: everything after the (host-side, per-batch) grid-shape draw runs
inside one jitted function — there is no host data loader at all; the train step
folds `generate_batch` in so data generation happens on-device, overlapped by XLA
with the rest of the step. Per-sample mode counts / polynomial degrees use static
max shapes with zero-masking instead of dynamic shapes.

Deviation from the reference (documented): RHS eigenvalue factors use the
consistent domain size L = dx*(n-1) (the reference uses dx*n at
`reverse.py:200-204`, which leaves a small systematic physics residual).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import (
    compute_domain_sizes,
    laplacian_eigenvalue_factors,
    peak_magnitudes,
    random_polynomials_and_second_derivatives,
    random_series_coefficients,
    set_max_magnitude_in_batch,
    set_max_magnitude_in_batch_and_return_scaling_factors,
    synthesize_series,
)
from .sampling import GridSamplingConfig, sample_grid_shape, sample_grid_spacings


@dataclasses.dataclass(frozen=True)
class Normalizations:
    """Reference `process_normalizations` (`reverse.py:22-36`)."""

    rhs_max_magnitude: Optional[float] = None  # None = off; value = target peak
    soln_max_magnitude: bool = False
    max_domain_size_squared: bool = False


@dataclasses.dataclass(frozen=True)
class ReverseConfig:
    batch_size: int
    grids: GridSamplingConfig
    fourier_mode_range: Tuple[int, int] = (1, 8)
    taylor_degree_range: Tuple[int, int] = (2, 6)
    bc: str = "dirichlet"  # 'dirichlet' | 'neumann' | 'mixed'
    include_taylor: bool = True
    return_boundaries: bool = False
    normalizations: Normalizations = Normalizations()

    def __post_init__(self):
        if self.bc not in ("dirichlet", "neumann", "mixed"):
            raise ValueError(f"unknown bc type {self.bc}")


def _boundaries_from_solution(soln: jax.Array) -> dict:
    """Edge slices, same layout as the reference's boundary outputs
    (`reverse.py:144-151`): left/right = first/last row of axis 0,
    top/bottom = first/last column of axis 1. NHWC -> (B, n_edge, C)."""
    return {
        "left": soln[:, 0, :, :],
        "right": soln[:, -1, :, :],
        "top": soln[:, :, 0, :],
        "bottom": soln[:, :, -1, :],
    }


@partial(jax.jit, static_argnums=(1, 2))
def generate_batch(key: jax.Array, cfg: ReverseConfig, grid_shape: Tuple[int, int]):
    """One on-device batch for a static grid shape.

    Returns a dict with 'rhs' (B,H,W,1), 'soln' (B,H,W,1), 'dx' ((B,1) for
    uniform spacing else (B,2)), and optionally 'boundaries' (4 edges).
    """
    B = cfg.batch_size
    n0, n1 = grid_shape
    k_dx, k_modes, k_coeff, k_cos, k_deg, k_p0, k_p1 = jax.random.split(key, 7)

    dx = sample_grid_spacings(k_dx, cfg.grids, grid_shape, B)
    L = compute_domain_sizes(dx, grid_shape)  # (B, 2)

    # --- Fourier component ---
    m_lo, m_hi = cfg.fourier_mode_range
    max_modes = (m_hi, m_hi)
    n_modes = jax.random.randint(k_modes, (B, 2), m_lo, m_hi + 1)
    eig = laplacian_eigenvalue_factors(L, max_modes)
    if cfg.bc == "dirichlet":
        sin_c = random_series_coefficients(k_coeff, B, max_modes, n_modes=n_modes)
        soln_f = synthesize_series(sin_c, None, grid_shape)
        rhs_f = synthesize_series(sin_c * eig, None, grid_shape)
    elif cfg.bc == "neumann":
        cos_c = random_series_coefficients(k_coeff, B, max_modes, n_modes=n_modes)
        soln_f = synthesize_series(None, cos_c, grid_shape)
        rhs_f = synthesize_series(None, cos_c * eig, grid_shape)
    else:  # mixed
        sin_c = random_series_coefficients(k_coeff, B, max_modes, n_modes=n_modes)
        cos_c = random_series_coefficients(k_cos, B, max_modes, n_modes=n_modes)
        soln_f = synthesize_series(sin_c, cos_c, grid_shape)
        rhs_f = synthesize_series(sin_c * eig, cos_c * eig, grid_shape)
    soln_f = soln_f[..., None]
    rhs_f = rhs_f[..., None]

    # --- Taylor (product-polynomial) component: not used for Neumann, like the
    # reference's Neumann generator (`reverse_neumann.py`). ---
    if cfg.include_taylor and cfg.bc != "neumann":
        d_lo, d_hi = cfg.taylor_degree_range
        hom = cfg.bc == "dirichlet"
        deg0 = jax.random.randint(k_deg, (B,), d_lo, d_hi + 1)
        deg1 = jax.random.randint(jax.random.fold_in(k_deg, 1), (B,), d_lo, d_hi + 1)
        x0, ddx0 = random_polynomials_and_second_derivatives(
            k_p0, B, d_hi, n0, L[:, 0], homogeneous_bc=hom, degree=deg0
        )
        x1, ddx1 = random_polynomials_and_second_derivatives(
            k_p1, B, d_hi, n1, L[:, 1], homogeneous_bc=hom, degree=deg1
        )
        soln_t = (x0[:, :, None] * x1[:, None, :])[..., None]
        rhs_t = (ddx0[:, :, None] * x1[:, None, :] + x0[:, :, None] * ddx1[:, None, :])[
            ..., None
        ]
        # match Taylor RHS peak to Fourier RHS peak per sample (`reverse.py:298-306`)
        scale = peak_magnitudes(rhs_f) / (peak_magnitudes(rhs_t) + 1e-30)
        scale = scale[:, None, None, None]
        soln = soln_f + soln_t * scale
        rhs = rhs_f + rhs_t * scale
    else:
        soln, rhs = soln_f, rhs_f

    # --- Normalizations (order as in `reverse.py:287-296`) ---
    norms = cfg.normalizations
    if norms.rhs_max_magnitude is not None:
        rhs, factors = set_max_magnitude_in_batch_and_return_scaling_factors(
            rhs, norms.rhs_max_magnitude
        )
        soln = soln * factors[:, None, None, None]
    if norms.soln_max_magnitude:
        soln = set_max_magnitude_in_batch(soln, 1.0)
    if norms.max_domain_size_squared:
        soln = soln / (jnp.max(L, axis=1) ** 2)[:, None, None, None]

    out = {"rhs": rhs, "soln": soln, "dx": dx}
    if cfg.return_boundaries:
        out["boundaries"] = _boundaries_from_solution(soln)
    return out


class ReverseDataset:
    """Iterator facade over `generate_batch`: host-side numpy RNG draws the
    per-batch grid shape (bucketed via `GridSamplingConfig.snap`), the device
    does everything else. Replaces the reference's keras Sequence host loader."""

    def __init__(self, cfg: ReverseConfig, seed: int = 0):
        self.cfg = cfg
        self._np_rng = np.random.default_rng(seed)
        self._key = jax.random.PRNGKey(seed)

    def __iter__(self):
        return self

    def __next__(self):
        shape = sample_grid_shape(self._np_rng, self.cfg.grids)
        self._key, sub = jax.random.split(self._key)
        return generate_batch(sub, self.cfg, shape)
