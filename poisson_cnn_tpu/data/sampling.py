"""Grid-shape / grid-spacing sampling with uniformly distributed aspect ratios.

Capability parity with the reference's AR-uniform sampling
(`poisson_CNN/dataset/utils/generate_uniformly_distributed_aspect_ratios.py:58-85`
and `generate_output_shapes_and_grid_spacings_from_aspect_ratios.py:4-41`):
aspect ratios AR = L0/L1 are drawn so that the under-1 and over-1 halves are
visited in proportion to their probability mass under independent uniform domain
sizes (otherwise wide grids would dominate).

TPU-split design: the *grid shape* (one per batch, shared by all samples — same
as the reference) is sampled host-side with numpy so it stays static under jit;
per-sample grid *spacings* realising the aspect ratios are sampled on-device.
An optional bucket size snaps shapes to a lattice to cap recompilation count.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _clip_integral(a1: float, b1: float, a0: float, b0: float) -> float:
    """Integral of clip(x, a0, b0) dx over [a1, b1] (piecewise-linear closed form)."""
    lo = a0 * max(0.0, min(b1, a0) - a1)
    mid_lo, mid_hi = max(a1, a0), min(b1, b0)
    mid = 0.5 * (mid_hi**2 - mid_lo**2) if mid_hi > mid_lo else 0.0
    hi = b0 * max(0.0, b1 - max(a1, b0))
    return lo + mid + hi


def proportion_of_aspect_ratios_under_1(
    L0_range: Tuple[float, float], L1_range: Tuple[float, float]
) -> float:
    """P(L0/L1 < 1) for independent uniform L0, L1 (reference
    `compute_proportion_of_AR_range_under_1`)."""
    a0, b0 = L0_range
    a1, b1 = L1_range
    num = _clip_integral(a1, b1, a0, b0) - a0 * (b1 - a1)
    return float(num / ((b0 - a0) * (b1 - a1)))


@dataclasses.dataclass(frozen=True)
class GridSamplingConfig:
    """Ranges for grid shapes and spacings (2-D).

    shape_range: ((n0_min, n0_max), (n1_min, n1_max)) — inclusive point counts.
    dx_range: (dx_min, dx_max), shared across dims like the shipped configs
    (`poisson_CNN/experiments/hpnn.json` uses a scalar range).
    uniform_grid_spacing: dx identical across dims (aspect ratio set by shape).
    snap: optional bucket size — shapes are snapped to multiples of `snap` + 1
    to bound the number of distinct compiled executables.
    """

    shape_range: Tuple[Tuple[int, int], Tuple[int, int]]
    dx_range: Tuple[float, float]
    uniform_grid_spacing: bool = True
    snap: Optional[int] = None

    def domain_size_range(self, dim: int) -> Tuple[float, float]:
        (n_min, n_max) = self.shape_range[dim]
        return ((n_min - 1) * self.dx_range[0], (n_max - 1) * self.dx_range[1])

    @property
    def ar_bounds(self) -> Tuple[float, float]:
        a0, b0 = self.domain_size_range(0)
        a1, b1 = self.domain_size_range(1)
        return a0 / b1, b0 / a1

    @property
    def p_ar_under_1(self) -> float:
        return proportion_of_aspect_ratios_under_1(
            self.domain_size_range(0), self.domain_size_range(1)
        )


def _snap(n: int, snap: Optional[int], n_min: int, n_max: int) -> int:
    if not snap:
        return n
    snapped = int(round((n - 1) / snap)) * snap + 1
    # clamp onto the largest/smallest lattice point inside the range
    hi = ((n_max - 1) // snap) * snap + 1
    lo = (-((1 - n_min) // snap)) * snap + 1  # ceil division
    if hi < n_min:  # no lattice point in range: give up on snapping
        return int(np.clip(n, n_min, n_max))
    return int(np.clip(snapped, max(lo, 1 + snap), hi))


def sample_balanced_aspect_ratio(rng: np.random.Generator, cfg: GridSamplingConfig) -> float:
    """One AR draw with the under/over-1 branch balance (host-side numpy)."""
    min_ar, max_ar = cfg.ar_bounds
    if rng.uniform() < cfg.p_ar_under_1:
        return float(rng.uniform(min_ar, min(1.0, max_ar)))
    return float(rng.uniform(max(1.0, min_ar), max_ar))


def sample_grid_shape(rng: np.random.Generator, cfg: GridSamplingConfig) -> Tuple[int, int]:
    """Sample the per-batch grid shape (host-side; static under jit).

    uniform-dx mode: n0 uniform in its range, n1 = n0/AR with a balanced AR draw
    (the only way to vary physical AR when dx is shared). Oversized dims are
    rescaled proportionally (reference clamping, `generate_output_shapes…py:34-40`).
    Non-uniform-dx mode: both dims drawn independently (AR is realised via dx).
    """
    (n0_min, n0_max), (n1_min, n1_max) = cfg.shape_range
    n0 = int(rng.integers(n0_min, n0_max + 1))
    if cfg.uniform_grid_spacing:
        ar = sample_balanced_aspect_ratio(rng, cfg)
        n1 = int(round(n0 / ar))
        scale = max(1.0, n0 / n0_max, n1 / n1_max)
        n0 = int(np.clip(round(n0 / scale), n0_min, n0_max))
        n1 = int(np.clip(round(n1 / scale), n1_min, n1_max))
    else:
        n1 = int(rng.integers(n1_min, n1_max + 1))
    return (
        _snap(n0, cfg.snap, n0_min, n0_max),
        _snap(n1, cfg.snap, n1_min, n1_max),
    )


def sample_grid_spacings(
    key: jax.Array, cfg: GridSamplingConfig, grid_shape: Tuple[int, int],
    batch_size: int, dtype=jnp.float32,
) -> jax.Array:
    """Per-sample grid spacings, on-device.

    uniform-dx mode: one scalar dx per sample -> (B, 1).
    Otherwise: dx0 ~ U(dx_range); AR per sample with the balanced branch scheme;
    dx1 = (L0/AR) / (n1-1) -> (B, 2).
    """
    d_lo, d_hi = cfg.dx_range
    if cfg.uniform_grid_spacing:
        return jax.random.uniform(
            key, (batch_size, 1), dtype=dtype, minval=d_lo, maxval=d_hi
        )
    k0, k1, k2 = jax.random.split(key, 3)
    dx0 = jax.random.uniform(k0, (batch_size,), dtype=dtype, minval=d_lo, maxval=d_hi)
    min_ar, max_ar = cfg.ar_bounds
    p_under = cfg.p_ar_under_1
    under = jax.random.uniform(k1, (batch_size,), dtype=dtype) < p_under
    u = jax.random.uniform(k2, (batch_size,), dtype=dtype)
    lo_branch = min_ar + u * (min(1.0, max_ar) - min_ar)
    hi_branch = max(1.0, min_ar) + u * (max_ar - max(1.0, min_ar))
    ar = jnp.where(under, lo_branch, hi_branch)
    L0 = dx0 * (grid_shape[0] - 1)
    dx1 = (L0 / ar) / (grid_shape[1] - 1)
    return jnp.stack([dx0, dx1], axis=-1)
