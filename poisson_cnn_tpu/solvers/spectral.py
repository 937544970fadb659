"""Spectral Poisson solvers via sine/cosine-transform matmuls (MXU-native).

These are the TPU replacements for the reference's native ground-truth solvers
(pyamg Ruge–Stüben / NVIDIA AMGX in `poisson_CNN/dataset/solvers/multigrid.py:38-150`
and the dense Cholesky path in `poisson_CNN/dataset/solvers/cholesky.py:122-186`):
on a uniform rectangular grid the 5-point (or continuous) Laplacian diagonalises in
a DST-I (Dirichlet) / DCT-II (Neumann) basis, so the solve is two small dense
matmuls per axis plus an elementwise eigenvalue division — exact to round-off for
the FD operator, fully batched, and jit/vmap-able so dataset generation runs
on-device at MXU speed.

Conventions: fields are (B, n0, n1, C) NHWC including boundary points; dx is
(B, 2) (or (B, 1) broadcast). 'fd' eigenvalues solve the discrete 5-point system
exactly; 'continuous' eigenvalues give the analytic solution of the PDE for
band-limited RHS.
"""

from __future__ import annotations

import math
from functools import lru_cache

import numpy as np
import jax
import jax.numpy as jnp


@lru_cache(maxsize=None)
def _dst1_matrix(n_interior: int) -> np.ndarray:
    """DST-I basis S[m, i] = sin(pi (m+1)(i+1) / (n_interior+1)).

    S @ S = (n_interior+1)/2 * I (symmetric, orthogonal up to scale).
    """
    m = np.arange(1, n_interior + 1)
    return np.sin(np.pi * np.outer(m, m) / (n_interior + 1))


@lru_cache(maxsize=None)
def _dct2_matrices(n: int):
    """DCT-II analysis matrix C[m, i] = cos(pi m (i + 1/2) / n) and its inverse.

    Rows are the eigenvectors of the 1-D Neumann (ghost-node) FD Laplacian.
    """
    m = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    fwd = np.cos(np.pi * m * (i + 0.5) / n)
    # Inverse: x = C^T @ (w * X) with w_0 = 1/n, w_m = 2/n
    w = np.full((n,), 2.0 / n)
    w[0] = 1.0 / n
    inv = fwd.T * w[None, :]
    return fwd, inv


@lru_cache(maxsize=None)
def _dct1_matrices(n: int):
    """DCT-I synthesis/analysis pair for the VERTEX-centered Neumann operator.

    V[i, k] = cos(pi k i / N) with N = n-1 are the right-eigenvectors of the
    mirror-ghost (u_{-1} = u_1) 1-D FD Laplacian on n vertex points — the
    discrete operator the reference's Neumann HPNN family trains against
    (cosine-series solutions, `dataset/generators/reverse_neumann.py:9-66`,
    satisfy the mirror condition exactly). Analysis (V^{-1}) in closed form:
    A[k, i] = (2/N) * w_k * w_i * cos(pi k i / N), w_0 = w_N = 1/2 else 1.
    Returns (analysis, synthesis) to mirror `_dct2_matrices`'s (fwd, inv).
    """
    N = n - 1
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    table = np.cos(np.pi * k * i / N)
    w = np.ones(n)
    w[0] = w[-1] = 0.5
    analysis = (2.0 / N) * w[:, None] * w[None, :] * table
    synthesis = table.T  # V[i, k] = cos(pi k i / N) (symmetric table)
    return analysis, synthesis


def _apply_axis(x: jax.Array, mat: jax.Array, axis: int) -> jax.Array:
    """Contract matrix (m, n) against spatial `axis` (0 or 1) of (B, n0, n1, C)."""
    return jnp.moveaxis(jnp.tensordot(mat, x, axes=[[1], [1 + axis]]), 0, 1 + axis)


def _dirichlet_eigenvalues(n_interior: int, mode: str, dtype):
    m = jnp.arange(1, n_interior + 1, dtype=dtype)
    if mode == "fd":
        # eigenvalues of the 1-D [1, -2, 1] operator (unit spacing)
        return 2.0 * jnp.cos(math.pi * m / (n_interior + 1)) - 2.0
    # continuous: -(m pi / L)^2 with L in units of dx*(n-1): lambda*dx^2 applied later
    raise ValueError(mode)


def poisson_solve_dirichlet(
    rhs: jax.Array, dx: jax.Array, mode: str = "fd"
) -> jax.Array:
    """Solve lap(u) = rhs with homogeneous Dirichlet BCs on the full grid.

    N-dimensional (1/2/3-D, matching the reference's dimensionality support):
    rhs: (B, n_0, ..., n_{d-1}, C) including boundary points (ignored);
    dx: (B, d) or (B, 1). Returns u with exact zeros on the boundary.
    mode='fd' inverts the (2d+1)-point FD operator exactly; mode='continuous'
    uses the -(m pi / L)^2 analytic eigenvalues.
    """
    nd = rhs.ndim - 2
    B = rhs.shape[0]
    ns = rhs.shape[1 : 1 + nd]
    dtype = rhs.dtype
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, nd))
    interior = (slice(None),) + tuple(slice(1, -1) for _ in range(nd)) + (slice(None),)
    f = rhs[interior]
    lam_sum = None
    for k, n in enumerate(ns):
        ni = n - 2
        s = jnp.asarray(_dst1_matrix(ni), dtype=dtype)
        f = _apply_axis(f, s, k)
        m = jnp.arange(1, ni + 1, dtype=dtype)
        if mode == "fd":
            lam = (2.0 * jnp.cos(math.pi * m / (ni + 1)) - 2.0)
            lam = lam.reshape((1,) + (1,) * k + (ni,) + (1,) * (nd - k - 1) + (1,))
            lam = lam / (dx[:, k] ** 2).reshape((B,) + (1,) * (nd + 1))
        elif mode == "continuous":
            L = dx[:, k] * (n - 1)
            lam = -((m * math.pi).reshape(
                (1,) + (1,) * k + (ni,) + (1,) * (nd - k - 1) + (1,)
            ) / L.reshape((B,) + (1,) * (nd + 1))) ** 2
        else:
            raise ValueError(f"unknown mode {mode}")
        lam_sum = lam if lam_sum is None else lam_sum + lam
    u = f / lam_sum
    for k, n in enumerate(ns):
        ni = n - 2
        s = jnp.asarray(_dst1_matrix(ni), dtype=dtype)
        u = _apply_axis(u, s, k) * (2.0 / (ni + 1))
    pad_cfg = ((0, 0),) + ((1, 1),) * nd + ((0, 0),)
    return jnp.pad(u, pad_cfg)


def lift_dirichlet_boundaries(
    rhs: jax.Array, boundaries: dict, dx: jax.Array
) -> jax.Array:
    """Fold nonzero Dirichlet boundary values into the interior RHS (BC lifting,
    the trick the reference's Cholesky solver uses, `cholesky.py:45-119`):
    for 5-point FD, subtract u_bc/dx^2 from the RHS at points adjacent to the
    boundary. boundaries: dict with keys 'left'/'right' ((B, n1, C), edges at
    i=0 / i=n0-1) and 'top'/'bottom' ((B, n0, C), edges at j=0 / j=n1-1).

    Returns a full-grid RHS whose interior encodes the BC contribution; solve it
    with `poisson_solve_dirichlet` then overwrite the boundary with the BC values
    (`apply_dirichlet_boundaries`).
    """
    B, n0, n1, C = rhs.shape
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))
    inv0 = (1.0 / dx[:, 0] ** 2)[:, None, None]
    inv1 = (1.0 / dx[:, 1] ** 2)[:, None, None]
    out = rhs
    if "left" in boundaries and boundaries["left"] is not None:
        out = out.at[:, 1, :, :].add(-boundaries["left"] * inv0)
    if "right" in boundaries and boundaries["right"] is not None:
        out = out.at[:, n0 - 2, :, :].add(-boundaries["right"] * inv0)
    if "top" in boundaries and boundaries["top"] is not None:
        out = out.at[:, :, 1, :].add(-boundaries["top"] * inv1)
    if "bottom" in boundaries and boundaries["bottom"] is not None:
        out = out.at[:, :, n1 - 2, :].add(-boundaries["bottom"] * inv1)
    return out


def apply_dirichlet_boundaries(u: jax.Array, boundaries: dict) -> jax.Array:
    """Write Dirichlet boundary values onto the border of u."""
    out = u
    if boundaries.get("left") is not None:
        out = out.at[:, 0, :, :].set(boundaries["left"])
    if boundaries.get("right") is not None:
        out = out.at[:, -1, :, :].set(boundaries["right"])
    if boundaries.get("top") is not None:
        out = out.at[:, :, 0, :].set(boundaries["top"])
    if boundaries.get("bottom") is not None:
        out = out.at[:, :, -1, :].set(boundaries["bottom"])
    return out


def poisson_solve(
    rhs: jax.Array, dx: jax.Array, boundaries: dict | None = None, mode: str = "fd"
) -> jax.Array:
    """General Dirichlet solve: BC lifting -> homogeneous spectral solve -> BC
    restore. This one function covers what the reference obtains from pyamg /
    AMGX / tf.linalg.cholesky_solve for its 'numerical' dataset mode."""
    if boundaries:
        rhs = lift_dirichlet_boundaries(rhs, boundaries, dx)
    u = poisson_solve_dirichlet(rhs, dx, mode=mode)
    if boundaries:
        u = apply_dirichlet_boundaries(u, boundaries)
    return u


def poisson_solve_neumann(
    rhs: jax.Array, dx: jax.Array, mode: str = "fd"
) -> jax.Array:
    """Solve lap(u) = rhs with homogeneous Neumann BCs (cell-centered ghost-node
    operator), returning the zero-mean solution; the zero mode of the RHS is
    projected out (solvability). rhs: (B, n0, n1, C) — all points are unknowns.

    This is the operator the Navier–Stokes pressure-Poisson step needs
    (`Navier_Stokes_2D/solvers.py:159-201` builds the same Neumann matrix with a
    zero-integral constraint).
    """
    B, n0, n1, C = rhs.shape
    dtype = rhs.dtype
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))
    f0, i0 = _dct2_matrices(n0)
    f1, i1 = _dct2_matrices(n1)
    f0 = jnp.asarray(f0, dtype=dtype)
    i0 = jnp.asarray(i0, dtype=dtype)
    f1 = jnp.asarray(f1, dtype=dtype)
    i1 = jnp.asarray(i1, dtype=dtype)
    fhat = _apply_axis(_apply_axis(rhs, f0, 0), f1, 1)
    m0 = jnp.arange(n0, dtype=dtype)
    m1 = jnp.arange(n1, dtype=dtype)
    if mode == "fd":
        lam0 = (2.0 * jnp.cos(math.pi * m0 / n0) - 2.0)[None, :, None, None] / (
            dx[:, 0] ** 2
        )[:, None, None, None]
        lam1 = (2.0 * jnp.cos(math.pi * m1 / n1) - 2.0)[None, None, :, None] / (
            dx[:, 1] ** 2
        )[:, None, None, None]
    elif mode == "continuous":
        L0 = dx[:, 0] * n0
        L1 = dx[:, 1] * n1
        lam0 = -((m0 * math.pi)[None, :, None, None] / L0[:, None, None, None]) ** 2
        lam1 = -((m1 * math.pi)[None, None, :, None] / L1[:, None, None, None]) ** 2
    else:
        raise ValueError(f"unknown mode {mode}")
    denom = lam0 + lam1
    # zero mode: set denominator to 1 and numerator to 0 (zero-mean solution)
    denom = denom.at[:, 0, 0, :].set(1.0)
    fhat = fhat.at[:, 0, 0, :].set(0.0)
    uhat = fhat / denom
    return _apply_axis(_apply_axis(uhat, i0, 0), i1, 1)


def poisson_solve_neumann_vertex(
    rhs: jax.Array, dx: jax.Array, mode: str = "fd"
) -> jax.Array:
    """Solve lap(u) = rhs with homogeneous Neumann BCs on a VERTEX grid
    (mirror-ghost operator, DCT-I basis), zero-weighted-mean solution with the
    incompatible zero mode projected out.

    This is the grid convention of the trained Neumann HPNN artifacts (cosine
    series on linspace(0, L, n) — the reference's Neumann family,
    `models/Homogeneous_Poisson_NN_Legacy.py:106-113` SYMMETRIC re-padding +
    `dataset/generators/reverse_neumann.py`); `poisson_solve_neumann` is its
    cell-centered (DCT-II) twin used by the NS pressure projection.
    """
    B, n0, n1, C = rhs.shape
    dtype = rhs.dtype
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))
    a0, s0 = _dct1_matrices(n0)
    a1, s1 = _dct1_matrices(n1)
    a0 = jnp.asarray(a0, dtype=dtype)
    s0 = jnp.asarray(s0, dtype=dtype)
    a1 = jnp.asarray(a1, dtype=dtype)
    s1 = jnp.asarray(s1, dtype=dtype)
    fhat = _apply_axis(_apply_axis(rhs, a0, 0), a1, 1)
    m0 = jnp.arange(n0, dtype=dtype)
    m1 = jnp.arange(n1, dtype=dtype)
    if mode == "fd":
        lam0 = (2.0 * jnp.cos(math.pi * m0 / (n0 - 1)) - 2.0)[None, :, None, None] / (
            dx[:, 0] ** 2
        )[:, None, None, None]
        lam1 = (2.0 * jnp.cos(math.pi * m1 / (n1 - 1)) - 2.0)[None, None, :, None] / (
            dx[:, 1] ** 2
        )[:, None, None, None]
    elif mode == "continuous":
        L0 = dx[:, 0] * (n0 - 1)
        L1 = dx[:, 1] * (n1 - 1)
        lam0 = -((m0 * math.pi)[None, :, None, None] / L0[:, None, None, None]) ** 2
        lam1 = -((m1 * math.pi)[None, None, :, None] / L1[:, None, None, None]) ** 2
    else:
        raise ValueError(f"unknown mode {mode}")
    denom = lam0 + lam1
    denom = denom.at[:, 0, 0, :].set(1.0)
    fhat = fhat.at[:, 0, 0, :].set(0.0)
    uhat = fhat / denom
    return _apply_axis(_apply_axis(uhat, s0, 0), s1, 1)
