"""Variable-density Poisson operator and solver: div((1/rho) grad u) = f.

Capability parity with the reference's unfinished variable-density extension
(`poisson_CNN/dataset/generators/variable_density:97-194`, an orphan module that
assembles a dense matrix on the host and is unimportable as shipped) and the
variable-density branch of `poisson_CNN/misc/conv_laplacian_loss.py` — here as a
working, on-device, matrix-free path: the operator uses harmonic-mean face
coefficients (standard conservative discretization), and the solve is the same
convergence-guarded CG used elsewhere. This is the pressure operator of
variable-density incompressible flow.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _face_coefficients(beta: jax.Array):
    """beta = 1/rho at cell centers (B, n0, n1, C) -> harmonic means on
    interior faces along each axis."""
    bx = 2.0 * beta[:, 1:, :, :] * beta[:, :-1, :, :] / (
        beta[:, 1:, :, :] + beta[:, :-1, :, :]
    )
    by = 2.0 * beta[:, :, 1:, :] * beta[:, :, :-1, :] / (
        beta[:, :, 1:, :] + beta[:, :, :-1, :]
    )
    return bx, by


def variable_density_operator(
    u: jax.Array, rho: jax.Array, dx: jax.Array
) -> jax.Array:
    """Apply div((1/rho) grad u) at interior points (homogeneous-Dirichlet
    boundary: border of u held fixed). u, rho: (B, n0, n1, C); dx: (B, 2)
    or (B, 1). Returns (B, n0-2, n1-2, C)."""
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (dx.shape[0], 2))
    beta = 1.0 / rho
    bx, by = _face_coefficients(beta)
    inv_dx2 = (1.0 / dx[:, 0] ** 2)[:, None, None, None]
    inv_dy2 = (1.0 / dx[:, 1] ** 2)[:, None, None, None]
    # flux differences at interior cells
    du_x = u[:, 1:, :, :] - u[:, :-1, :, :]  # gradient on x-faces
    flux_x = bx * du_x
    div_x = (flux_x[:, 1:, 1:-1, :] - flux_x[:, :-1, 1:-1, :]) * inv_dx2
    du_y = u[:, :, 1:, :] - u[:, :, :-1, :]
    flux_y = by * du_y
    div_y = (flux_y[:, 1:-1, 1:, :] - flux_y[:, 1:-1, :-1, :]) * inv_dy2
    return div_x + div_y


def variable_density_poisson_solve(
    rhs: jax.Array, rho: jax.Array, dx: jax.Array, n_iterations: int = 400
) -> jax.Array:
    """Solve div((1/rho) grad u) = rhs with homogeneous Dirichlet BCs by
    matrix-free CG (operator is symmetric negative definite; CG recurrences are
    sign-consistent). Full-grid in/out; boundary returned as zeros."""
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (dx.shape[0], 2))

    def matvec(w_int):
        w = jnp.pad(w_int, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return variable_density_operator(w, rho, dx)

    b = rhs[:, 1:-1, 1:-1, :]
    x = jnp.zeros_like(b)
    r = b - matvec(x)
    p = r
    axes = (1, 2, 3)
    rs = jnp.sum(r * r, axis=axes)
    rs0 = rs

    def body(_, carry):
        x, r, p, rs = carry
        live = rs > 1e-12 * rs0 + 1e-30
        ap = matvec(p)
        denom = jnp.sum(p * ap, axis=axes)
        alpha = jnp.where(live, rs / jnp.where(denom == 0, 1.0, denom), 0.0)
        x = x + alpha[:, None, None, None] * p
        r = r - alpha[:, None, None, None] * ap
        rs_new = jnp.where(live, jnp.sum(r * r, axis=axes), rs)
        beta = jnp.where(live, rs_new / jnp.where(rs == 0, 1.0, rs), 0.0)
        return x, r, r + beta[:, None, None, None] * p, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, n_iterations, body, (x, r, p, rs))
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
