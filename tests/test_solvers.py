"""Solver tests — oracles follow SURVEY.md §4: FD-exactness (spectral inverse of
the discrete operator), analytic eigen-solutions, cross-solver agreement."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from poisson_cnn_tpu import ops, solvers


def _random_dirichlet_problem(key, B=2, n0=33, n1=41, dx_vals=(0.02, 0.03)):
    """Random interior field u (zero boundary) and its exact 5-point image b=Au."""
    u = jax.random.normal(key, (B, n0, n1, 1))
    u = u.at[:, 0, :, :].set(0.0).at[:, -1, :, :].set(0.0)
    u = u.at[:, :, 0, :].set(0.0).at[:, :, -1, :].set(0.0)
    dx = jnp.tile(jnp.asarray([dx_vals]), (B, 1))
    b = solvers.laplacian_dirichlet(u, dx)
    return u, b, dx


def test_spectral_dirichlet_fd_exact():
    u, b, dx = _random_dirichlet_problem(jax.random.PRNGKey(0))
    u_rec = solvers.poisson_solve_dirichlet(b, dx, mode="fd")
    rel = float(jnp.linalg.norm(u_rec - u) / jnp.linalg.norm(u))
    assert rel < 1e-4, rel  # fp32 round-off


def test_spectral_dirichlet_continuous_matches_eigenfunction():
    # u = sin(pi x/L0) sin(2 pi y/L1) -> lap u = -(pi/L0)^2+... * u, exact in
    # the continuous-mode spectral solver.
    n0, n1 = 65, 49
    dx = jnp.asarray([[0.01, 0.02]])
    L0, L1 = 0.01 * (n0 - 1), 0.02 * (n1 - 1)
    x = jnp.linspace(0, L0, n0)
    y = jnp.linspace(0, L1, n1)
    u = (jnp.sin(math.pi * x / L0)[:, None] * jnp.sin(2 * math.pi * y / L1)[None, :])[
        None, :, :, None
    ]
    lam = -((math.pi / L0) ** 2 + (2 * math.pi / L1) ** 2)
    rhs = lam * u
    u_rec = solvers.poisson_solve_dirichlet(rhs, dx, mode="continuous")
    rel = float(jnp.linalg.norm(u_rec - u) / jnp.linalg.norm(u))
    assert rel < 1e-4, rel


def test_bc_lifting_nonzero_boundaries():
    # manufactured solution u = x + y (harmonic) with Dirichlet data from itself
    n0, n1 = 33, 33
    dx = jnp.asarray([[0.05, 0.05]])
    x = jnp.arange(n0) * 0.05
    y = jnp.arange(n1) * 0.05
    u_exact = (x[:, None] + y[None, :])[None, :, :, None]
    rhs = jnp.zeros_like(u_exact)
    boundaries = {
        "left": u_exact[:, 0, :, :],
        "right": u_exact[:, -1, :, :],
        "top": u_exact[:, :, 0, :],
        "bottom": u_exact[:, :, -1, :],
    }
    u = solvers.poisson_solve(rhs, dx, boundaries=boundaries, mode="fd")
    rel = float(jnp.linalg.norm(u - u_exact) / jnp.linalg.norm(u_exact))
    assert rel < 1e-4, rel


def test_neumann_solver_fd_consistency():
    # build rhs from a known zero-mean field via the ghost-node Neumann operator,
    # solve, compare (both zero-mean).
    key = jax.random.PRNGKey(1)
    B, n0, n1 = 2, 32, 24
    dx = jnp.tile(jnp.asarray([[0.1, 0.07]]), (B, 1))
    u = jax.random.normal(key, (B, n0, n1, 1))
    u = u - jnp.mean(u, axis=(1, 2, 3), keepdims=True)
    # ghost-node Neumann Laplacian: reflect edges
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    lap = (
        (up[:, 2:, 1:-1] - 2 * u + up[:, :-2, 1:-1]) / dx[:, 0][:, None, None, None] ** 2
        + (up[:, 1:-1, 2:] - 2 * u + up[:, 1:-1, :-2]) / dx[:, 1][:, None, None, None] ** 2
    )
    u_rec = solvers.poisson_solve_neumann(lap, dx, mode="fd")
    rel = float(jnp.linalg.norm(u_rec - u) / jnp.linalg.norm(u))
    assert rel < 1e-3, rel


def test_neumann_vertex_solver_fd_exact():
    """`poisson_solve_neumann_vertex` inverts the mirror-ghost (u[-1]=u[1])
    VERTEX-grid operator exactly (the trained Neumann artifacts' convention,
    reference `dataset/generators/reverse_neumann.py:9-66`)."""
    key = jax.random.PRNGKey(11)
    B, n0, n1 = 2, 17, 21
    dx = jnp.tile(jnp.asarray([[0.05, 0.04]]), (B, 1))
    f = jax.random.normal(key, (B, n0, n1, 1))
    u = solvers.poisson_solve_neumann_vertex(f, dx, mode="fd")
    # mirror-ghost Laplacian (u_{-1} = u_1 -> 'reflect' padding)
    up = jnp.pad(u, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    lap = (
        (up[:, 2:, 1:-1] - 2 * u + up[:, :-2, 1:-1]) / dx[:, 0][:, None, None, None] ** 2
        + (up[:, 1:-1, 2:] - 2 * u + up[:, 1:-1, :-2]) / dx[:, 1][:, None, None, None] ** 2
    )
    # residual must equal f minus its weighted zero mode (solvability projection)
    w0 = jnp.ones((n0,)).at[0].set(0.5).at[-1].set(0.5)
    w1 = jnp.ones((n1,)).at[0].set(0.5).at[-1].set(0.5)
    W = (w0[:, None] * w1[None, :])[None, :, :, None]
    f_proj = f - jnp.sum(f * W, axis=(1, 2, 3), keepdims=True) / jnp.sum(W)
    rel = float(jnp.linalg.norm(lap - f_proj) / jnp.linalg.norm(f_proj))
    assert rel < 1e-4, rel


def test_neumann_vertex_solver_continuous_matches_eigenfunction():
    """cos(2 pi x/L0) cos(3 pi y/L1) is an exact continuous-mode solution."""
    import numpy as np

    n0, n1 = 17, 21
    dx = jnp.asarray([[0.05, 0.04]])
    L0, L1 = 0.05 * (n0 - 1), 0.04 * (n1 - 1)
    x = np.linspace(0, L0, n0)
    y = np.linspace(0, L1, n1)
    uex = np.cos(2 * np.pi * x / L0)[:, None] * np.cos(3 * np.pi * y / L1)[None, :]
    lam = -((2 * np.pi / L0) ** 2) - (3 * np.pi / L1) ** 2
    rhs = jnp.asarray(lam * uex, jnp.float32)[None, :, :, None]
    u = solvers.poisson_solve_neumann_vertex(rhs, dx, mode="continuous")
    rel = float(jnp.linalg.norm(u[0, :, :, 0] - uex) / jnp.linalg.norm(uex))
    assert rel < 1e-5, rel


def test_cg_matches_spectral():
    u, b, dx = _random_dirichlet_problem(jax.random.PRNGKey(2), n0=17, n1=17)
    u_cg = solvers.conjugate_gradient(b, dx, n_iterations=400)
    rel = float(jnp.linalg.norm(u_cg - u) / jnp.linalg.norm(u))
    assert rel < 1e-3, rel


def test_multigrid_converges():
    key = jax.random.PRNGKey(3)
    B, n0, n1 = 1, 65, 65
    dx = jnp.asarray([[0.02, 0.02]])
    # smooth rhs so the answer is well-resolved
    c = ops.random_series_coefficients(key, B, (4, 4))
    L = ops.compute_domain_sizes(dx, (n0, n1))
    rhs = ops.synthesize_series(
        c * ops.laplacian_eigenvalue_factors(L, (4, 4)), None, (n0, n1)
    )[..., None]
    u_mg = solvers.multigrid_poisson_solve(rhs, dx, n_cycles=12)
    u_sp = solvers.poisson_solve_dirichlet(rhs, dx, mode="fd")
    rel = float(jnp.linalg.norm(u_mg - u_sp) / jnp.linalg.norm(u_sp))
    assert rel < 1e-4, rel


def test_multigrid_rejects_uncoarsenable():
    with pytest.raises(ValueError):
        solvers.multigrid_poisson_solve(
            jnp.zeros((1, 20, 20, 1)), jnp.ones((1, 2))
        )


def test_cholesky_matches_spectral():
    u, b, dx = _random_dirichlet_problem(jax.random.PRNGKey(4), n0=21, n1=17)
    u_ch = solvers.cholesky_poisson_solve(b, dx)
    rel = float(jnp.linalg.norm(u_ch - u) / jnp.linalg.norm(u))
    assert rel < 1e-3, rel


def test_cholesky_with_boundaries_matches_spectral_path():
    key = jax.random.PRNGKey(5)
    B, n0, n1 = 1, 17, 17
    dx = jnp.asarray([[0.1, 0.1]])
    rhs = jax.random.normal(key, (B, n0, n1, 1))
    boundaries = {
        "left": jax.random.normal(jax.random.PRNGKey(6), (B, n1, 1)),
        "right": None,
        "top": None,
        "bottom": None,
    }
    u_sp = solvers.poisson_solve(rhs, dx, boundaries=boundaries)
    u_ch = solvers.cholesky_poisson_solve(rhs, dx, boundaries=boundaries)
    rel = float(jnp.linalg.norm(u_sp - u_ch) / jnp.linalg.norm(u_sp))
    assert rel < 1e-3, rel


def test_jacobi_smoother_reduces_residual():
    u, b, dx = _random_dirichlet_problem(jax.random.PRNGKey(7), n0=17, n1=17)
    u0 = jnp.zeros_like(b)
    r0 = float(jnp.linalg.norm(b - solvers.laplacian_dirichlet(u0, dx)))
    u1 = solvers.jacobi_smooth(u0, b, dx, 50)
    r1 = float(
        jnp.linalg.norm(
            (b - solvers.laplacian_dirichlet(u1, dx))[:, 1:-1, 1:-1, :]
        )
    )
    assert r1 < 0.5 * r0, (r0, r1)


def test_solvers_jit_and_vmap_clean():
    u, b, dx = _random_dirichlet_problem(jax.random.PRNGKey(8), n0=17, n1=17)
    f = jax.jit(lambda b, dx: solvers.poisson_solve_dirichlet(b, dx))
    out = f(b, dx)
    assert out.shape == b.shape


def test_spectral_dirichlet_3d_and_1d():
    """N-D spectral solve (1-D and 3-D paths, reference 1-3-D capability)."""
    key = jax.random.PRNGKey(9)
    # 3-D: random interior field, exact 7-point image, recover
    u = jax.random.normal(key, (2, 17, 15, 13, 1))
    for axis in (1, 2, 3):
        u = jnp.moveaxis(jnp.moveaxis(u, axis, 1).at[:, 0].set(0).at[:, -1].set(0), 1, axis)
    dx = jnp.tile(jnp.asarray([[0.1, 0.12, 0.09]]), (2, 1))
    b = ops.apply_fd_operator(u, dx, 3, 2)
    b_full = jnp.pad(b, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)))
    u_rec = solvers.poisson_solve_dirichlet(b_full, dx, mode="fd")
    rel = float(jnp.linalg.norm(u_rec - u) / jnp.linalg.norm(u))
    assert rel < 1e-3, rel
    # 1-D
    u1 = jax.random.normal(key, (2, 33, 1)).at[:, 0].set(0).at[:, -1].set(0)
    dx1 = jnp.full((2, 1), 0.05)
    b1 = ops.apply_fd_operator(u1, dx1, 3, 2)
    b1_full = jnp.pad(b1, ((0, 0), (1, 1), (0, 0)))
    u1_rec = solvers.poisson_solve_dirichlet(b1_full, dx1, mode="fd")
    rel1 = float(jnp.linalg.norm(u1_rec - u1) / jnp.linalg.norm(u1))
    assert rel1 < 1e-3, rel1
