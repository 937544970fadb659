"""Matrix-free iterative Poisson solvers: weighted Jacobi and conjugate gradients.

All functions operate on (B, n0, n1, C) NHWC fields with per-sample dx (B, 2),
homogeneous-Dirichlet boundary handling by freezing the border (the reference's
Jacobi layer updates the interior only, `poisson_CNN/layers/JacobiIterationLayer.py:44-53`).
Everything is lax.fori_loop/while-free static-iteration code so XLA can fuse each
sweep into a couple of stencil kernels — no per-sample kernels are materialised.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp


def _axis_slices(nd: int, dim: int):
    """(lo, mid, hi) index tuples shifting spatial `dim` of a (B,*sp,C) array
    while keeping every other spatial axis on its interior."""
    mid = [slice(1, -1)] * nd
    lo, hi = list(mid), list(mid)
    lo[dim] = slice(0, -2)
    hi[dim] = slice(2, None)
    w = lambda s: (slice(None),) + tuple(s) + (slice(None),)
    return w(lo), w(mid), w(hi)


def _laplacian_interior(u: jax.Array, inv_dx2: jax.Array) -> jax.Array:
    """(2N+1)-point Laplacian on the interior (shape (B, *spatial-2, C)).
    inv_dx2: (B, nd) per-sample 1/dx^2. Rank-agnostic (1/2/3-D)."""
    nd = u.ndim - 2
    bshape = (-1,) + (1,) * (nd + 1)
    out = None
    for dim in range(nd):
        lo, mid, hi = _axis_slices(nd, dim)
        term = (u[hi] - 2.0 * u[mid] + u[lo]) * inv_dx2[:, dim].reshape(bshape)
        out = term if out is None else out + term
    return out


def laplacian_dirichlet(u: jax.Array, dx: jax.Array) -> jax.Array:
    """Full-grid operator: interior Laplacian, identity (zero) on the frozen
    boundary. Used as the matvec for CG/multigrid. Rank-agnostic."""
    nd = u.ndim - 2
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (dx.shape[0], nd))
    inv_dx2 = 1.0 / dx**2
    out = jnp.zeros_like(u)
    interior = (slice(None),) + (slice(1, -1),) * nd + (slice(None),)
    return out.at[interior].set(_laplacian_interior(u, inv_dx2))


def jacobi_smooth(
    u: jax.Array,
    rhs: jax.Array,
    dx: jax.Array,
    n_iterations: int,
    omega: float = 0.8,
) -> jax.Array:
    """n weighted-Jacobi sweeps of lap(u)=rhs with the boundary of u frozen.

    Same math as the reference's differentiable post-smoother
    (`JacobiIterationLayer.py:7-66`) but expressed as slicing stencils the
    compiler fuses, with per-sample dx entering as scalar multipliers.
    Rank-agnostic (1/2/3-D, like the reference's ndims dispatch).
    """
    nd = u.ndim - 2
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (dx.shape[0], nd))
    inv_dx2 = (1.0 / dx**2).astype(u.dtype)
    bshape = (-1,) + (1,) * (nd + 1)
    diag = (-2.0 * jnp.sum(inv_dx2, axis=1)).reshape(bshape)
    interior = (slice(None),) + (slice(1, -1),) * nd + (slice(None),)
    f_int = rhs[interior]

    def body(_, u):
        off = None
        for dim in range(nd):
            lo, _, hi = _axis_slices(nd, dim)
            term = (u[hi] + u[lo]) * inv_dx2[:, dim].reshape(bshape)
            off = term if off is None else off + term
        u_new_int = (f_int - off) / diag
        u_int = (1.0 - omega) * u[interior] + omega * u_new_int
        return u.at[interior].set(u_int)

    return jax.lax.fori_loop(0, n_iterations, body, u)


def conjugate_gradient(
    rhs: jax.Array,
    dx: jax.Array,
    n_iterations: int = 200,
    x0: jax.Array | None = None,
) -> jax.Array:
    """Fixed-iteration CG for lap(u)=rhs with homogeneous Dirichlet BCs.

    Runs on the interior unknowns only; fixed iteration count keeps the loop a
    static `fori_loop` (TPU-friendly — no host sync on residual norms).
    Rank-agnostic (1/2/3-D), like laplacian_dirichlet/jacobi_smooth above.
    """
    nd = rhs.ndim - 2
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (dx.shape[0], nd))
    inv_dx2 = (1.0 / dx**2).astype(rhs.dtype)
    border = ((0, 0),) + ((1, 1),) * nd + ((0, 0),)
    interior = (slice(None),) + (slice(1, -1),) * nd + (slice(None),)
    bshape = (-1,) + (1,) * (nd + 1)

    def matvec(x_int):
        # x_int: (B, *spatial-2, C) -> embed with zero border, apply, crop
        return _laplacian_interior(jnp.pad(x_int, border), inv_dx2)

    b = rhs[interior]
    x = jnp.zeros_like(b) if x0 is None else x0[interior]
    # (CG's recurrences are sign-consistent for definite operators of either
    # sign; lap is negative definite on the homogeneous-Dirichlet subspace)
    r = b - matvec(x)
    p = r
    axes = tuple(range(1, rhs.ndim))
    rs = jnp.sum(r * r, axis=axes)
    rs0 = rs

    def body(_, carry):
        # freeze converged samples (fp32 round-off amplification guard)
        x, r, p, rs = carry
        live = rs > 1e-12 * rs0 + 1e-30
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=axes)
        alpha = jnp.where(live, rs / jnp.where(denom == 0, 1.0, denom), 0.0)
        x = x + alpha.reshape(bshape) * p
        r = r - alpha.reshape(bshape) * ap
        rs_new = jnp.where(live, jnp.sum(r * r, axis=axes), rs)
        beta = jnp.where(live, rs_new / jnp.where(rs == 0, 1.0, rs), 0.0)
        p = r + beta.reshape(bshape) * p
        return x, r, p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, n_iterations, body, (x, r, p, rs))
    # non-finite samples must stay non-finite: the converged-freeze guard's
    # NaN comparisons are False, which would silently return the initial guess
    x = jnp.where(jnp.isfinite(rs0).reshape(bshape), x, jnp.full_like(x, jnp.nan))
    return jnp.pad(x, border)
