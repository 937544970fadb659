"""Staggered-grid (MAC) finite-difference operators as pure functions.

Capability parity with the reference's `VelocityField` methods
(`Navier_Stokes_2D/structure.py:117-247`): divergence, 5-point diffusion and
4-point-averaged nonlinear convection, plus ghost-cell completion of boundary
conditions (`structure.py:348-426` — the reference uses cubic extrapolation for
its ghosts; here linear-reflection ghosts u_g = 2 u_wall - u_int, which keeps
the wall value 2nd-order accurate and every operator a fused slice stencil).

Shapes: u (m+1, n) on x-faces, v (m, n+1) on y-faces, p/phi (m, n) at centers.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def complete_u(u: jax.Array, grid, u_bc: Callable, t) -> jax.Array:
    """Apply normal BCs on the W/E faces and add S/N ghost rows.

    Returns (m+1, n+2) with ghost columns at j=0 and j=n+1.
    """
    xu, yu = jnp.asarray(grid.xu), jnp.asarray(grid.yu)
    u = u.at[0, :].set(u_bc(xu[0], yu, t))
    u = u.at[-1, :].set(u_bc(xu[-1], yu, t))
    u_s = u_bc(xu, grid.y0, t)  # wall value at the S boundary
    u_n = u_bc(xu, grid.y1, t)
    ghost_s = 2.0 * u_s - u[:, 0]
    ghost_n = 2.0 * u_n - u[:, -1]
    return jnp.concatenate([ghost_s[:, None], u, ghost_n[:, None]], axis=1)


def complete_v(v: jax.Array, grid, v_bc: Callable, t) -> jax.Array:
    """Apply normal BCs on the S/N faces and add W/E ghost columns.

    Returns (m+2, n+1) with ghost rows at i=0 and i=m+1.
    """
    xv, yv = jnp.asarray(grid.xv), jnp.asarray(grid.yv)
    v = v.at[:, 0].set(v_bc(xv, yv[0], t))
    v = v.at[:, -1].set(v_bc(xv, yv[-1], t))
    v_w = v_bc(grid.x0, yv, t)
    v_e = v_bc(grid.x1, yv, t)
    ghost_w = 2.0 * v_w - v[0, :]
    ghost_e = 2.0 * v_e - v[-1, :]
    return jnp.concatenate([ghost_w[None, :], v, ghost_e[None, :]], axis=0)


def divergence(u: jax.Array, v: jax.Array, grid) -> jax.Array:
    """Cell-centered divergence (m, n) — reference `structure.py:191-205`."""
    return (u[1:, :] - u[:-1, :]) / grid.dx + (v[:, 1:] - v[:, :-1]) / grid.dy


def grad_p_faces(p: jax.Array, grid) -> Tuple[jax.Array, jax.Array]:
    """Pressure gradient at interior faces; boundary faces get zero (their
    velocities are set by BCs). Returns ((m+1, n), (m, n+1))."""
    gx = jnp.zeros((grid.m + 1, grid.n), dtype=p.dtype)
    gx = gx.at[1:-1, :].set((p[1:, :] - p[:-1, :]) / grid.dx)
    gy = jnp.zeros((grid.m, grid.n + 1), dtype=p.dtype)
    gy = gy.at[:, 1:-1].set((p[:, 1:] - p[:, :-1]) / grid.dy)
    return gx, gy


def laplacian_u(u_cmp: jax.Array, grid) -> jax.Array:
    """5-point Laplacian of the completed u field at interior x-faces.
    u_cmp: (m+1, n+2). Returns (m-1, n)."""
    c = u_cmp[1:-1, 1:-1]  # interior faces (m-1, n)
    d2x = (u_cmp[2:, 1:-1] - 2 * c + u_cmp[:-2, 1:-1]) / grid.dx**2
    d2y = (u_cmp[1:-1, 2:] - 2 * c + u_cmp[1:-1, :-2]) / grid.dy**2
    return d2x + d2y


def laplacian_v(v_cmp: jax.Array, grid) -> jax.Array:
    """5-point Laplacian of the completed v field at interior y-faces.
    v_cmp: (m+2, n+1). Returns (m, n-1)."""
    c = v_cmp[1:-1, 1:-1]
    d2x = (v_cmp[2:, 1:-1] - 2 * c + v_cmp[:-2, 1:-1]) / grid.dx**2
    d2y = (v_cmp[1:-1, 2:] - 2 * c + v_cmp[1:-1, :-2]) / grid.dy**2
    return d2x + d2y


def convection(u_cmp: jax.Array, v_cmp: jax.Array, grid):
    """Nonlinear convection (u·grad)u in conservative MAC form with 4-point
    averages (reference `structure.py:225-247`).

    Returns (conv_u (m-1, n), conv_v (m, n-1)) at interior faces.
    """
    dx, dy = grid.dx, grid.dy
    u = u_cmp  # (m+1, n+2)
    v = v_cmp  # (m+2, n+1)

    # --- conv_u = d(u^2)/dx + d(uv)/dy at interior x-faces ---
    uc = 0.5 * (u[1:, 1:-1] + u[:-1, 1:-1])  # u at cell centers (m, n)
    du2dx = (uc[1:, :] ** 2 - uc[:-1, :] ** 2) / dx  # (m-1, n)
    # u and v at cell corners (m-1 interior face columns, n+1 corner rows)
    u_corner = 0.5 * (u[1:-1, 1:] + u[1:-1, :-1])  # (m-1, n+1)
    v_corner = 0.5 * (v[2:-1, :] + v[1:-2, :])  # (m-1, n+1)
    uv = u_corner * v_corner
    duvdy = (uv[:, 1:] - uv[:, :-1]) / dy  # (m-1, n)
    conv_u = du2dx + duvdy

    # --- conv_v = d(uv)/dx + d(v^2)/dy at interior y-faces ---
    vc = 0.5 * (v[1:-1, 1:] + v[1:-1, :-1])  # v at cell centers (m, n)
    dv2dy = (vc[:, 1:] ** 2 - vc[:, :-1] ** 2) / dy  # (m, n-1)
    u_corner2 = 0.5 * (u[:, 2:-1] + u[:, 1:-2])  # (m+1, n-1)
    v_corner2 = 0.5 * (v[1:, 1:-1] + v[:-1, 1:-1])  # (m+1, n-1)
    uv2 = u_corner2 * v_corner2
    duvdx = (uv2[1:, :] - uv2[:-1, :]) / dx  # (m, n-1)
    conv_v = duvdx + dv2dy

    return conv_u, conv_v


def helmholtz_solve_u(
    rhs_int: jax.Array, alpha: float, grid, n_iterations: int = 60
) -> jax.Array:
    """Solve (I - alpha*Lap) w = rhs on interior x-faces with HOMOGENEOUS
    Dirichlet data (wall value 0 via ghost reflection w_g = -w_adjacent).
    Fixed-iteration CG (matrix free). rhs_int: (m-1, n)."""

    def matvec(w):
        w_cmp = jnp.pad(w, ((1, 1), (0, 0)))  # zero normal faces
        w_cmp = jnp.concatenate(
            [-w_cmp[:, :1], w_cmp, -w_cmp[:, -1:]], axis=1
        )  # reflection ghosts
        return w - alpha * laplacian_u(w_cmp, grid)

    return _cg(matvec, rhs_int, n_iterations)


def helmholtz_solve_v(
    rhs_int: jax.Array, alpha: float, grid, n_iterations: int = 60
) -> jax.Array:
    """Same for v at interior y-faces. rhs_int: (m, n-1)."""

    def matvec(w):
        w_cmp = jnp.pad(w, ((0, 0), (1, 1)))
        w_cmp = jnp.concatenate(
            [-w_cmp[:1, :], w_cmp, -w_cmp[-1:, :]], axis=0
        )
        return w - alpha * laplacian_v(w_cmp, grid)

    return _cg(matvec, rhs_int, n_iterations)


def _cg(matvec, b, n_iterations):
    x = jnp.zeros_like(b)
    r = b - matvec(x)
    p = r
    rs = jnp.sum(r * r)
    rs0 = rs

    def body(_, carry):
        # freeze once converged (fp32 round-off amplification guard)
        x, r, p, rs = carry
        live = rs > 1e-12 * rs0 + 1e-30
        ap = matvec(p)
        denom = jnp.sum(p * ap)
        alpha = jnp.where(live, rs / jnp.where(denom == 0, 1.0, denom), 0.0)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.where(live, jnp.sum(r * r), rs)
        beta = jnp.where(live, rs_new / jnp.where(rs == 0, 1.0, rs), 0.0)
        return x, r, p * beta + r, rs_new

    x, _, _, _ = jax.lax.fori_loop(0, n_iterations, body, (x, r, p, rs))
    return x
