"""Matrix-free geometric multigrid V-cycle for the 2-D Poisson equation.

TPU-native replacement for the reference's pyamg Ruge–Stüben / NVIDIA AMGX
ground-truth solvers (`poisson_CNN/dataset/solvers/multigrid.py:38-150`): the
reference calls external native AMG per sample on the host; here a geometric
V-cycle with weighted-Jacobi smoothing, full-weighting restriction and bilinear
prolongation runs fully batched on-device. Grid hierarchy is computed statically
from the (static) shape, so the whole solve jits to a fixed stencil pipeline.

Requires grid sizes with n = 2^k * m + 1 (coarsenable a few levels); arbitrary
sizes fall back to plain CG via `solvers.iterative`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .iterative import jacobi_smooth as _xla_jacobi_smooth, _laplacian_interior


def _smooth(u, rhs, dx, n):
    # fused Pallas sweeps on TPU for single-channel fields (honest 10.3x at 256^2,
    # scripts/bench_pallas_smoother.py),
    # XLA stencils elsewhere; multigrid smoothing is the V-cycle's hot loop
    import jax

    if jax.default_backend() == "tpu" and u.shape[-1] == 1:
        from ..ops.pallas_kernels import _jacobi_pallas_ad

        return _jacobi_pallas_ad(u, rhs, dx, n, 0.8)
    return _xla_jacobi_smooth(u, rhs, dx, n)


def _coarsenable_levels(n: int, min_size: int = 5) -> int:
    """How many times (n-1) can be halved while staying >= min_size points."""
    levels = 0
    while (n - 1) % 2 == 0 and (n - 1) // 2 + 1 >= min_size:
        n = (n - 1) // 2 + 1
        levels += 1
    return levels


def _restrict(r: jax.Array) -> jax.Array:
    """Full-weighting restriction to the coarse grid (n -> (n-1)/2 + 1),
    boundary rows kept zero (homogeneous Dirichlet residual)."""
    interior = (
        4.0 * r[:, 2:-2:2, 2:-2:2, :]
        + 2.0
        * (
            r[:, 1:-3:2, 2:-2:2, :]
            + r[:, 3:-1:2, 2:-2:2, :]
            + r[:, 2:-2:2, 1:-3:2, :]
            + r[:, 2:-2:2, 3:-1:2, :]
        )
        + (
            r[:, 1:-3:2, 1:-3:2, :]
            + r[:, 1:-3:2, 3:-1:2, :]
            + r[:, 3:-1:2, 1:-3:2, :]
            + r[:, 3:-1:2, 3:-1:2, :]
        )
    ) / 16.0
    return jnp.pad(interior, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _prolong(uc: jax.Array, fine_shape) -> jax.Array:
    """Bilinear prolongation coarse -> fine (boundaries stay zero)."""
    B, nc0, nc1, C = uc.shape
    nf0, nf1 = fine_shape
    uf = jnp.zeros((B, nf0, nf1, C), dtype=uc.dtype)
    uf = uf.at[:, ::2, ::2, :].set(uc)
    uf = uf.at[:, 1::2, ::2, :].set(0.5 * (uc[:, :-1, :, :] + uc[:, 1:, :, :]))
    uf = uf.at[:, ::2, 1::2, :].set(0.5 * (uc[:, :, :-1, :] + uc[:, :, 1:, :]))
    uf = uf.at[:, 1::2, 1::2, :].set(
        0.25
        * (
            uc[:, :-1, :-1, :]
            + uc[:, 1:, :-1, :]
            + uc[:, :-1, 1:, :]
            + uc[:, 1:, 1:, :]
        )
    )
    return uf


def _residual(u, rhs, inv_dx2):
    res = rhs[:, 1:-1, 1:-1, :] - _laplacian_interior(u, inv_dx2)
    return jnp.pad(res, ((0, 0), (1, 1), (1, 1), (0, 0)))


def _v_cycle(u, rhs, dx, level: int, pre: int, post: int):
    u = _smooth(u, rhs, dx, pre)
    if level > 0:
        inv_dx2 = (1.0 / dx**2).astype(u.dtype)
        res = _residual(u, rhs, inv_dx2)
        res_c = _restrict(res)
        dx_c = 2.0 * dx
        ec = jnp.zeros(
            (u.shape[0], (u.shape[1] - 1) // 2 + 1, (u.shape[2] - 1) // 2 + 1, u.shape[3]),
            dtype=u.dtype,
        )
        ec = _v_cycle(ec, res_c, dx_c, level - 1, pre, post)
        u = u + _prolong(ec, (u.shape[1], u.shape[2]))
    else:
        u = _smooth(u, rhs, dx, 40)
    return _smooth(u, rhs, dx, post)


def multigrid_poisson_solve(
    rhs: jax.Array,
    dx: jax.Array,
    n_cycles: int = 10,
    pre_smooth: int = 3,
    post_smooth: int = 3,
    x0: jax.Array | None = None,
) -> jax.Array:
    """V-cycle solve of lap(u)=rhs with homogeneous Dirichlet BCs.

    rhs: (B, n0, n1, C); dx: (B, 2) or (B, 1). Both grid dims must satisfy
    n = 2^k*m + 1 with at least one coarsenable level; otherwise raise (callers
    fall back to CG or the spectral solver).
    """
    B, n0, n1, C = rhs.shape
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))
    levels = min(_coarsenable_levels(n0), _coarsenable_levels(n1))
    if levels < 1:
        raise ValueError(
            f"grid {n0}x{n1} is not coarsenable; use conjugate_gradient instead"
        )
    u = jnp.zeros_like(rhs) if x0 is None else x0

    def body(_, u):
        return _v_cycle(u, rhs, dx, levels, pre_smooth, post_smooth)

    return jax.lax.fori_loop(0, n_cycles, body, u)
