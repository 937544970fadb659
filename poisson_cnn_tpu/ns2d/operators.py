"""Staggered-grid (MAC) finite-difference operators as pure functions.

Capability parity with the reference's `VelocityField` methods
(`Navier_Stokes_2D/structure.py:117-247`): divergence, 5-point diffusion and
4-point-averaged nonlinear convection, plus ghost-cell completion of boundary
conditions. Ghost values use cubic (3rd-degree polynomial) extrapolation of the
wall value through the first three interior faces — the reference's scheme
(`structure.py:397-419`): a cubic through the ghost (at -h/2) and interior
points (h/2, 3h/2, 5h/2) that takes the wall value w at 0 satisfies
    ghost = (16/5) w - 3 f1 + f2 - (1/5) f3,
which keeps the tangential wall condition 3rd-order accurate (linear reflection
ghosts cap the overall scheme below 2nd order on the Taylor-vortex oracle).

Shapes: u (m+1, n) on x-faces, v (m, n+1) on y-faces, p/phi (m, n) at centers.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def cubic_ghost(wall, f1, f2, f3):
    """Ghost value whose cubic interpolant hits `wall` at the boundary."""
    return 3.2 * wall - 3.0 * f1 + f2 - 0.2 * f3


def cubic_wall_value(g, f1, f2, f3):
    """Inverse of `cubic_ghost`: the wall value implied by ghost + interior."""
    return 0.3125 * (g + 3.0 * f1 - f2 + 0.2 * f3)


def complete_u(u: jax.Array, grid, u_bc: Callable, t) -> jax.Array:
    """Apply normal BCs on the W/E faces and add S/N cubic ghost columns.

    Returns (m+1, n+2) with ghost columns at j=0 and j=n+1.
    """
    xu, yu = jnp.asarray(grid.xu), jnp.asarray(grid.yu)
    u = u.at[0, :].set(u_bc(xu[0], yu, t))
    u = u.at[-1, :].set(u_bc(xu[-1], yu, t))
    u_s = u_bc(xu, grid.y0, t)  # wall value at the S boundary
    u_n = u_bc(xu, grid.y1, t)
    ghost_s = cubic_ghost(u_s, u[:, 0], u[:, 1], u[:, 2])
    ghost_n = cubic_ghost(u_n, u[:, -1], u[:, -2], u[:, -3])
    return jnp.concatenate([ghost_s[:, None], u, ghost_n[:, None]], axis=1)


def complete_v(v: jax.Array, grid, v_bc: Callable, t) -> jax.Array:
    """Apply normal BCs on the S/N faces and add W/E cubic ghost rows.

    Returns (m+2, n+1) with ghost rows at i=0 and i=m+1.
    """
    xv, yv = jnp.asarray(grid.xv), jnp.asarray(grid.yv)
    v = v.at[:, 0].set(v_bc(xv, yv[0], t))
    v = v.at[:, -1].set(v_bc(xv, yv[-1], t))
    v_w = v_bc(grid.x0, yv, t)
    v_e = v_bc(grid.x1, yv, t)
    ghost_w = cubic_ghost(v_w, v[0, :], v[1, :], v[2, :])
    ghost_e = cubic_ghost(v_e, v[-1, :], v[-2, :], v[-3, :])
    return jnp.concatenate([ghost_w[None, :], v, ghost_e[None, :]], axis=0)


def complete_phi(phi: jax.Array) -> jax.Array:
    """Mirror (zero-normal-derivative) ghost ring for a cell-centered potential
    (reference `structure.py:551-566`). (m, n) -> (m+2, n+2)."""
    return jnp.pad(phi, ((1, 1), (1, 1)), mode="edge")


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


def _hom_cubic_ghosts_u(w: jax.Array) -> jax.Array:
    """Zero-padded normal faces + homogeneous cubic S/N ghosts. (m-1,n)->(m+1,n+2)."""
    w_cmp = jnp.pad(w, ((1, 1), (0, 0)))  # zero normal faces
    ghost_s = cubic_ghost(0.0, w_cmp[:, 0], w_cmp[:, 1], w_cmp[:, 2])
    ghost_n = cubic_ghost(0.0, w_cmp[:, -1], w_cmp[:, -2], w_cmp[:, -3])
    return jnp.concatenate([ghost_s[:, None], w_cmp, ghost_n[:, None]], axis=1)


def _hom_cubic_ghosts_v(w: jax.Array) -> jax.Array:
    """Zero-padded normal faces + homogeneous cubic W/E ghosts. (m,n-1)->(m+2,n+1)."""
    w_cmp = jnp.pad(w, ((0, 0), (1, 1)))
    ghost_w = cubic_ghost(0.0, w_cmp[0, :], w_cmp[1, :], w_cmp[2, :])
    ghost_e = cubic_ghost(0.0, w_cmp[-1, :], w_cmp[-2, :], w_cmp[-3, :])
    return jnp.concatenate([ghost_w[None, :], w_cmp, ghost_e[None, :]], axis=0)


def helmholtz_solve_u(
    rhs_int: jax.Array, alpha: float, grid, n_iterations: int = 60
) -> jax.Array:
    """Solve (I - alpha*Lap) w = rhs on interior x-faces with HOMOGENEOUS
    boundary data (Dirichlet wall value 0 via cubic ghosts). The cubic ghost
    coupling makes the operator nonsymmetric, so fixed-iteration BiCGStab
    (matrix free — the reference assembles sparse matrices and calls scipy
    bicg, `Navier_Stokes_2D/solvers.py:118-155`). rhs_int: (m-1, n)."""

    def matvec(w):
        return w - alpha * laplacian_u(_hom_cubic_ghosts_u(w), grid)

    return _bicgstab(matvec, rhs_int, n_iterations)


def helmholtz_solve_v(
    rhs_int: jax.Array, alpha: float, grid, n_iterations: int = 60
) -> jax.Array:
    """Same for v at interior y-faces. rhs_int: (m, n-1)."""

    def matvec(w):
        return w - alpha * laplacian_v(_hom_cubic_ghosts_v(w), grid)

    return _bicgstab(matvec, rhs_int, n_iterations)


def _bicgstab(matvec, b, n_iterations):
    """Fixed-iteration matrix-free BiCGStab with a convergence freeze (running
    far past convergence in fp32 otherwise amplifies round-off). Suits the
    mildly nonsymmetric cubic-ghost Helmholtz operators; lax.fori_loop keeps
    the whole solve inside one XLA computation."""
    x = jnp.zeros_like(b)
    r = b - matvec(x)
    r0 = r  # shadow residual
    rho = jnp.sum(r0 * r)
    p = r
    rs0 = jnp.sum(r * r)

    def body(_, carry):
        x, r, p, rho = carry
        live = jnp.sum(r * r) > 1e-14 * rs0 + 1e-30

        def do(args):
            x, r, p, rho = args
            v = matvec(p)
            denom = jnp.sum(r0 * v)
            a = rho / jnp.where(denom == 0, 1.0, denom)
            s = r - a * v
            t = matvec(s)
            tt = jnp.sum(t * t)
            w = jnp.sum(t * s) / jnp.where(tt == 0, 1.0, tt)
            x2 = x + a * p + w * s
            r2 = s - w * t
            rho2 = jnp.sum(r0 * r2)
            beta = (rho2 / jnp.where(rho == 0, 1.0, rho)) * (
                a / jnp.where(w == 0, 1.0, w)
            )
            p2 = r2 + beta * (p - w * v)
            return x2, r2, p2, rho2

        return jax.lax.cond(live, do, lambda args: args, (x, r, p, rho))

    x, _, _, _ = jax.lax.fori_loop(0, n_iterations, body, (x, r, p, rho))
    # a non-finite system must produce a non-finite result: the freeze guard
    # (NaN comparisons are False) would otherwise return the pristine zero
    # initial state and silently mask an upstream blow-up
    return jnp.where(jnp.isfinite(rs0), x, jnp.full_like(x, jnp.nan))


def _onesided_wall_value(f1, f2, f3):
    """Extrapolate cell-sampled values (at h/2, 3h/2, 5h/2 off the wall) to the
    wall by the interpolating quadratic: O(h^3) accurate and ghost-free.

    The reference instead runs its cubic formula through the potential's MIRROR
    ghost (`Gauge_method.gradphi_app`, `solvers.py:457-478` with
    `CentredPotential.complete`, `structure.py:551-566`), which collapses to
    0.3125*(4 f1 - f2 + 0.2 f3) = f(0) + 0.3125*h*f'(0) + O(h^3) — an O(h)
    wall-gradient truncation term the one-sided quadratic avoids. Measured on
    a DCT-solved potential: one-sided error 3.2e-3 -> 8.0e-4 -> 2.0e-4 for
    m = 16/32/64 (exactly 2nd order). The gauge method converges at 2nd order
    on the Taylor oracle with this estimator (rates 2.12, 1.96).
    """
    return 1.875 * f1 - 1.25 * f2 + 0.375 * f3


def gradphi_u(phi_cmp: jax.Array, grid) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """d(phi)/dx at x-faces from a completed potential (m+2, n+2), plus its
    wall values on the S/N boundaries by one-sided quadratic extrapolation
    (reference capability: `Gauge_method.gradphi_app`, `solvers.py:457-478`).

    Returns (grad (m+1, n) at interior columns, wall_S (m+1,), wall_N (m+1,)).
    """
    g = (phi_cmp[1:, :] - phi_cmp[:-1, :]) / grid.dx  # (m+1, n+2) w/ ghost cols
    wall_s = _onesided_wall_value(g[:, 1], g[:, 2], g[:, 3])
    wall_n = _onesided_wall_value(g[:, -2], g[:, -3], g[:, -4])
    return g[:, 1:-1], wall_s, wall_n


def gradphi_v(phi_cmp: jax.Array, grid) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """d(phi)/dy at y-faces + its W/E wall values (one-sided quadratic).

    Returns (grad (m, n+1) at interior rows, wall_W (n+1,), wall_E (n+1,)).
    """
    g = (phi_cmp[:, 1:] - phi_cmp[:, :-1]) / grid.dy  # (m+2, n+1) w/ ghost rows
    wall_w = _onesided_wall_value(g[1, :], g[2, :], g[3, :])
    wall_e = _onesided_wall_value(g[-2, :], g[-3, :], g[-4, :])
    return g[1:-1, :], wall_w, wall_e


def complete_gauge_u(m_u: jax.Array, wall_s: jax.Array, wall_n: jax.Array) -> jax.Array:
    """Add S/N cubic ghost columns to the gauge u-component using its
    tangential wall values m = u_wall + d(phi)/dx (reference
    `Gauge_method.complete_mstar`, `solvers.py:585-623`). (m+1,n)->(m+1,n+2)."""
    ghost_s = cubic_ghost(wall_s, m_u[:, 0], m_u[:, 1], m_u[:, 2])
    ghost_n = cubic_ghost(wall_n, m_u[:, -1], m_u[:, -2], m_u[:, -3])
    return jnp.concatenate([ghost_s[:, None], m_u, ghost_n[:, None]], axis=1)


def complete_gauge_v(m_v: jax.Array, wall_w: jax.Array, wall_e: jax.Array) -> jax.Array:
    """Add W/E cubic ghost rows to the gauge v-component. (m,n+1)->(m+2,n+1)."""
    ghost_w = cubic_ghost(wall_w, m_v[0, :], m_v[1, :], m_v[2, :])
    ghost_e = cubic_ghost(wall_e, m_v[-1, :], m_v[-2, :], m_v[-3, :])
    return jnp.concatenate([ghost_w[None, :], m_v, ghost_e[None, :]], axis=0)
