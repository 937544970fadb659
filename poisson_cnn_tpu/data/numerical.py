"""Numerical-mode training data: random smooth RHS/boundaries, ground truth by
an on-device solver.

Capability parity with `poisson_CNN/dataset/generators/numerical.py:10-216`: the
reference synthesizes random smooth fields (coarse noise -> bicubic upsample)
for the RHS and each requested boundary, then calls pyamg/AMGX/Cholesky on the
host for ground truth. Here smooth fields are random truncated trig series with
per-sample random mode counts (same "controllable smoothness" capability, no
dynamic shapes), and ground truth comes from the FD-exact spectral solver with
Dirichlet BC lifting (`solvers.spectral`) — fully on-device and jitted, so the
'numerical' data mode runs at device speed inside the train step.

Used for DBCNN training (zero RHS, one nonzero boundary —
`train/dbcnn_legacy_train.py:26`) and end-to-end PCNN training (all four
boundaries + random RHS — `train/pcnn_end_to_end.py:28`).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import (
    random_series_coefficients,
    set_max_magnitude_in_batch_and_return_scaling_factors,
    synthesize_series,
)
from ..solvers import (
    apply_dirichlet_boundaries,
    cholesky_poisson_solve,
    lift_dirichlet_boundaries,
    multigrid_poisson_solve,
    poisson_solve,
)
from .sampling import GridSamplingConfig, sample_grid_spacings


def _random_smooth_1d(key, batch, n_points, mode_range, magnitude_range, dtype=jnp.float32):
    """Random smooth 1-D functions vanishing at both endpoints (sine series),
    scaled to a random peak magnitude. (B, n_points, 1)."""
    k_modes, k_coeff, k_mag = jax.random.split(key, 3)
    m_lo, m_hi = mode_range
    n_modes = jax.random.randint(k_modes, (batch, 1), m_lo, m_hi + 1)
    c = random_series_coefficients(k_coeff, batch, (m_hi,), n_modes=n_modes)
    f = synthesize_series(c, None, (n_points,))  # (B, n)
    mag = jax.random.uniform(
        k_mag, (batch,), dtype=dtype,
        minval=magnitude_range[0], maxval=magnitude_range[1],
    )
    f, _ = set_max_magnitude_in_batch_and_return_scaling_factors(f, 1.0, eps=1e-30)
    return (f * mag[:, None])[..., None]


def _random_smooth_2d(key, batch, grid_shape, mode_range, magnitude_range, dtype=jnp.float32):
    k_modes, k_coeff, k_cos, k_mag = jax.random.split(key, 4)
    m_lo, m_hi = mode_range
    n_modes = jax.random.randint(k_modes, (batch, 2), m_lo, m_hi + 1)
    sin_c = random_series_coefficients(k_coeff, batch, (m_hi, m_hi), n_modes=n_modes)
    cos_c = random_series_coefficients(k_cos, batch, (m_hi, m_hi), n_modes=n_modes)
    f = synthesize_series(sin_c, cos_c, grid_shape)
    mag = jax.random.uniform(
        k_mag, (batch,), dtype=dtype,
        minval=magnitude_range[0], maxval=magnitude_range[1],
    )
    f, _ = set_max_magnitude_in_batch_and_return_scaling_factors(f, 1.0, eps=1e-30)
    return (f * mag[:, None, None])[..., None]


@dataclasses.dataclass(frozen=True)
class NumericalConfig:
    batch_size: int
    grids: GridSamplingConfig
    rhs: str = "random"  # 'random' | 'zero'
    nonzero_boundaries: Tuple[str, ...] = ("left",)
    boundary_mode_range: Tuple[int, int] = (3, 8)
    rhs_mode_range: Tuple[int, int] = (1, 8)
    magnitude_range: Tuple[float, float] = (0.5, 1.5)
    solver: str = "spectral"  # 'spectral' | 'multigrid' | 'cholesky'
    # (the reference's pluggable ground-truth solver dispatch,
    # `dataset/generators/numerical.py:121-131`; all three run on-device here)

    def __post_init__(self):
        for b in self.nonzero_boundaries:
            if b not in ("left", "right", "top", "bottom"):
                raise ValueError(f"unknown boundary {b}")
        if self.solver not in ("spectral", "multigrid", "cholesky"):
            raise ValueError(f"unknown solver {self.solver}")


@partial(jax.jit, static_argnums=(1, 2))
def generate_numerical_batch(
    key: jax.Array, cfg: NumericalConfig, grid_shape: Tuple[int, int]
):
    """Batch dict: 'rhs', 'boundaries' (all four; zeros where not requested),
    'dx', 'soln' (spectral FD ground truth)."""
    B = cfg.batch_size
    n0, n1 = grid_shape
    keys = jax.random.split(key, 6)
    dx = sample_grid_spacings(keys[0], cfg.grids, grid_shape, B)

    if cfg.rhs == "random":
        rhs = _random_smooth_2d(
            keys[1], B, grid_shape, cfg.rhs_mode_range, cfg.magnitude_range
        )
    else:
        rhs = jnp.zeros((B, n0, n1, 1))

    edge_lengths = {"left": n1, "right": n1, "top": n0, "bottom": n0}
    boundaries = {}
    for i, name in enumerate(("left", "right", "top", "bottom")):
        if name in cfg.nonzero_boundaries:
            boundaries[name] = _random_smooth_1d(
                keys[2 + i], B, edge_lengths[name],
                cfg.boundary_mode_range, cfg.magnitude_range,
            )
        else:
            boundaries[name] = jnp.zeros((B, edge_lengths[name], 1))

    if cfg.solver == "spectral":
        soln = poisson_solve(rhs, dx, boundaries=boundaries, mode="fd")
    elif cfg.solver == "multigrid":
        from ..solvers.multigrid import _coarsenable_levels

        if min(_coarsenable_levels(n0), _coarsenable_levels(n1)) < 1:
            # grid shape (static) isn't V-cycle coarsenable (needs n = 2^k*m+1):
            # fall back to the FD-exact spectral solve instead of raising at
            # trace time mid-training (arbitrary GridSamplingConfig shapes are
            # legal; the ground truth just comes from a different exact solver)
            soln = poisson_solve(rhs, dx, boundaries=boundaries, mode="fd")
        else:
            lifted = lift_dirichlet_boundaries(rhs, boundaries, dx)
            soln = multigrid_poisson_solve(lifted, dx, n_cycles=12)
            soln = apply_dirichlet_boundaries(soln, boundaries)
    else:  # cholesky
        soln = cholesky_poisson_solve(rhs, dx, boundaries=boundaries)
    return {"rhs": rhs, "boundaries": boundaries, "dx": dx, "soln": soln}
