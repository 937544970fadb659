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
    resize_align_corners,
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


def _control_levels(n: int) -> Tuple[int, ...]:
    """Static control-point counts spanning the reference's random-smoothness
    range [5, n//1.5) (`numerical.py:23`)."""
    hi = max(6, int(n // 1.5))
    mid1 = max(6, hi // 4)
    mid2 = max(7, hi // 2)
    return tuple(sorted({5, mid1, mid2, hi}))


def _random_coarse_noise_nd(key, batch, grid_shape, magnitude_range, dtype=jnp.float32):
    """The reference's smooth-field recipe (`numerical.py:10-35`), any rank:
    uniform noise on a coarse control grid, (bi/tri)cubic-supersampled to the
    output grid; fewer control points = smoother field. TPU-first: the
    reference draws a random control count per batch (dynamic shapes); here
    each sample randomly SELECTS among a static set of control levels, so
    everything stays jit-compiled (all levels are synthesized — data-gen is
    cheap next to the train step). For 2-D inputs the key-splitting and draws
    are identical to the round-3 `_random_coarse_noise_2d`, so artifact
    coarse-noise eval rows stay comparable."""
    nd = len(grid_shape)
    levels = [_control_levels(n) for n in grid_shape]
    n_levels = min(len(lv) for lv in levels)
    keys = jax.random.split(key, n_levels + 2)
    candidates = []
    for i in range(n_levels):
        shape = (batch,) + tuple(lv[i] for lv in levels) + (1,)
        noise = 2.0 * jax.random.uniform(keys[i], shape, dtype=dtype) - 1.0
        candidates.append(resize_align_corners(noise, grid_shape, "bicubic"))
    stacked = jnp.stack(candidates)  # (L, B, *grid_shape, 1)
    sel = jax.random.randint(keys[-2], (batch,), 0, n_levels)
    f = stacked[sel, jnp.arange(batch)]
    mag = jax.random.uniform(
        keys[-1], (batch,), dtype=dtype,
        minval=magnitude_range[0], maxval=magnitude_range[1],
    )
    f, _ = set_max_magnitude_in_batch_and_return_scaling_factors(f, 1.0, eps=1e-30)
    return f * mag.reshape((batch,) + (1,) * (nd + 1))


def _random_coarse_noise_2d(key, batch, grid_shape, magnitude_range, dtype=jnp.float32):
    return _random_coarse_noise_nd(key, batch, grid_shape, magnitude_range, dtype)


def _random_coarse_noise_1d(key, batch, n_points, magnitude_range, dtype=jnp.float32):
    """1-D coarse-noise boundary fields (`numerical.py:37-72`). NOTE: unlike
    the sine-series variant these do NOT vanish at the endpoints — matching the
    reference's boundary generator."""
    levels = _control_levels(n_points)
    keys = jax.random.split(key, len(levels) + 2)
    candidates = []
    for i, c in enumerate(levels):
        noise = 2.0 * jax.random.uniform(keys[i], (batch, c, 1), dtype=dtype) - 1.0
        candidates.append(resize_align_corners(noise, (n_points,), "bicubic"))
    stacked = jnp.stack(candidates)
    sel = jax.random.randint(keys[-2], (batch,), 0, len(levels))
    f = stacked[sel, jnp.arange(batch)]
    mag = jax.random.uniform(
        keys[-1], (batch,), dtype=dtype,
        minval=magnitude_range[0], maxval=magnitude_range[1],
    )
    f, _ = set_max_magnitude_in_batch_and_return_scaling_factors(f, 1.0, eps=1e-30)
    return f * mag[:, None, None]


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
    field_type: str = "coarse_noise"  # 'coarse_noise' | 'series'
    # 'coarse_noise' = the reference's training distribution (uniform noise on
    # a coarse control grid, bicubic-supersampled, `numerical.py:10-35`);
    # 'series' = truncated trig series (boundary values vanish at endpoints)

    def __post_init__(self):
        for b in self.nonzero_boundaries:
            if b not in ("left", "right", "top", "bottom"):
                raise ValueError(f"unknown boundary {b}")
        if self.solver not in ("spectral", "multigrid", "cholesky"):
            raise ValueError(f"unknown solver {self.solver}")
        if self.field_type not in ("coarse_noise", "series"):
            raise ValueError(f"unknown field_type {self.field_type}")


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

    coarse = cfg.field_type == "coarse_noise"
    if cfg.rhs == "random":
        if coarse:
            rhs = _random_coarse_noise_2d(
                keys[1], B, grid_shape, cfg.magnitude_range
            )
        else:
            rhs = _random_smooth_2d(
                keys[1], B, grid_shape, cfg.rhs_mode_range, cfg.magnitude_range
            )
    else:
        rhs = jnp.zeros((B, n0, n1, 1))

    edge_lengths = {"left": n1, "right": n1, "top": n0, "bottom": n0}
    boundaries = {}
    for i, name in enumerate(("left", "right", "top", "bottom")):
        if name in cfg.nonzero_boundaries:
            if coarse:
                boundaries[name] = _random_coarse_noise_1d(
                    keys[2 + i], B, edge_lengths[name], cfg.magnitude_range
                )
            else:
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
