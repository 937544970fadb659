"""Dense direct Poisson solver (batched Cholesky) — parity with the reference's
`cholesky_poisson_solve` (`poisson_CNN/dataset/solvers/cholesky.py:9-186`).

The reference assembles a dense 5-point matrix per grid and calls
tf.linalg.cholesky_solve; here the (negated, SPD) matrix is assembled once per
static shape as a Kronecker sum of 1-D operators and factorised per sample with
jax.scipy cho_factor under vmap (dx varies per sample). Intended for small grids
and cross-validation of the spectral/multigrid paths — the spectral solver is the
production ground-truth path on TPU.
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.linalg import cho_factor, cho_solve

from .spectral import (
    lift_dirichlet_boundaries,
    apply_dirichlet_boundaries,
)


@lru_cache(maxsize=None)
def _second_difference(n_interior: int) -> np.ndarray:
    """1-D [1, -2, 1] operator on n interior points (homogeneous Dirichlet)."""
    d = -2.0 * np.eye(n_interior)
    off = np.eye(n_interior, k=1) + np.eye(n_interior, k=-1)
    return d + off


def cholesky_poisson_solve(
    rhs: jax.Array,
    dx: jax.Array,
    boundaries: dict | None = None,
) -> jax.Array:
    """Solve lap(u) = rhs with Dirichlet BCs by dense Cholesky.

    rhs: (B, n0, n1, C) incl. boundary points; dx: (B, 2) or (B, 1);
    boundaries: optional dict of nonzero Dirichlet edge values (see
    `spectral.lift_dirichlet_boundaries`). Returns the full-grid solution.
    """
    B, n0, n1, C = rhs.shape
    dtype = rhs.dtype
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))
    if boundaries:
        rhs = lift_dirichlet_boundaries(rhs, boundaries, dx)
    ni0, ni1 = n0 - 2, n1 - 2
    d0 = jnp.asarray(_second_difference(ni0), dtype=dtype)
    d1 = jnp.asarray(_second_difference(ni1), dtype=dtype)
    eye0 = jnp.eye(ni0, dtype=dtype)
    eye1 = jnp.eye(ni1, dtype=dtype)

    f = rhs[:, 1:-1, 1:-1, :].reshape(B, ni0 * ni1, C)

    def solve_one(f_b, dx_b):
        # A = (1/dx0^2) D0 (x) I + (1/dx1^2) I (x) D1 ; solve -A u = -f (SPD)
        a = jnp.kron(d0, eye1) / dx_b[0] ** 2 + jnp.kron(eye0, d1) / dx_b[1] ** 2
        chol = cho_factor(-a)
        return cho_solve(chol, -f_b)

    u_int = jax.vmap(solve_one)(f, dx)  # (B, ni0*ni1, C)
    u = jnp.pad(
        u_int.reshape(B, ni0, ni1, C), ((0, 0), (1, 1), (1, 1), (0, 0))
    )
    if boundaries:
        u = apply_dirichlet_boundaries(u, boundaries)
    return u
