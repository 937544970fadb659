"""Unit tests for the core numerics, using the same oracles as the reference's
embedded self-tests (SURVEY.md §4): closed-form stencils, analytic integrals,
physics self-consistency (FD Laplacian of synthesized solution ≈ analytic RHS)."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from poisson_cnn_tpu import ops


def test_fd_coefficients_5pt_second_derivative():
    c = ops.fd_stencil_1d(5, 2)
    np.testing.assert_allclose(c, [-1 / 12, 4 / 3, -5 / 2, 4 / 3, -1 / 12], atol=1e-12)


def test_fd_coefficients_3pt():
    np.testing.assert_allclose(ops.fd_stencil_1d(3, 2), [1.0, -2.0, 1.0], atol=1e-12)
    np.testing.assert_allclose(ops.fd_stencil_1d(3, 1), [-0.5, 0.0, 0.5], atol=1e-12)


def test_build_fd_stencil_cross():
    s = ops.build_fd_stencil([3, 3], 2)
    assert s.shape == (2, 3, 3)
    # direction 0: varies along axis 0 at center column
    np.testing.assert_allclose(s[0][:, 1], [1, -2, 1], atol=1e-12)
    np.testing.assert_allclose(s[1][1, :], [1, -2, 1], atol=1e-12)


def test_apply_fd_operator_quadratic_exact():
    # u = x^2 + 3 y^2 -> laplacian = 8 exactly for any centered 2nd-order stencil
    nx, ny = 17, 23
    dx = jnp.array([[0.1, 0.2]])
    x = jnp.arange(nx) * dx[0, 0]
    y = jnp.arange(ny) * dx[0, 1]
    u = (x[:, None] ** 2 + 3.0 * y[None, :] ** 2)[None, :, :, None]
    lap = ops.laplacian_fd(u, dx, stencil_size=3)
    np.testing.assert_allclose(np.asarray(lap), 8.0, rtol=1e-4)
    lap5 = ops.apply_fd_operator(u, dx, 5, 2)
    assert lap5.shape == (1, nx - 4, ny - 4, 1)
    np.testing.assert_allclose(np.asarray(lap5), 8.0, rtol=1e-3)


def test_integrate_on_grid_polynomial():
    # integral of (x*y)^2 over [0,Lx]x[0,Ly] = Lx^3 Ly^3 / 9
    n = 101
    Lx, Ly = 2.0, 3.0
    x = jnp.linspace(0, Lx, n)
    y = jnp.linspace(0, Ly, n)
    f = ((x[:, None] * y[None, :]) ** 2)[None, :, :, None]
    val = ops.integrate_on_grid(f, jnp.array([[Lx, Ly]]), 47)
    np.testing.assert_allclose(float(val[0, 0]), Lx**3 * Ly**3 / 9, rtol=2e-3)


def test_integrate_on_grid_3d_fractional_power():
    # Same oracle family as the reference self-test (integral_loss.py:181-203):
    # integral of (xyz)^(2/3) over [0,L]^3 = (3/5 * L^(5/3))^3
    n, L = 48, 1.3
    x = jnp.linspace(0, L, n)
    f = (x[:, None, None] * x[None, :, None] * x[None, None, :]) ** (2.0 / 3.0)
    f = f[None, ..., None]
    val = ops.integrate_on_grid(f, jnp.array([[L, L, L]]), 24)
    exact = (3.0 / 5.0 * L ** (5.0 / 3.0)) ** 3
    assert abs(float(val[0, 0]) - exact) / exact < 0.01


def test_integral_lp_error_zero_for_identical():
    key = jax.random.PRNGKey(0)
    f = jax.random.normal(key, (2, 32, 32, 1))
    val = ops.integral_lp_error(f, f, jnp.ones((2, 2)), 7, p=2)
    np.testing.assert_allclose(np.asarray(val), 0.0, atol=1e-12)


def test_smooth_function_dirichlet_boundary_zero():
    key = jax.random.PRNGKey(1)
    c = ops.random_series_coefficients(key, 3, (4, 5))
    f = ops.synthesize_series(c, None, (33, 41))
    assert f.shape == (3, 33, 41)
    np.testing.assert_allclose(np.asarray(f[:, 0, :]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f[:, -1, :]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f[:, :, 0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(f[:, :, -1]), 0.0, atol=1e-5)


def test_smooth_function_mode_count_masking():
    key = jax.random.PRNGKey(2)
    n_modes = jnp.array([[2, 3], [4, 5]])
    c = ops.random_series_coefficients(key, 2, (4, 5), n_modes=n_modes)
    assert float(jnp.abs(c[0, 2:, :]).max()) == 0.0
    assert float(jnp.abs(c[0, :, 3:]).max()) == 0.0
    assert float(jnp.abs(c[1, 3, 4])) > 0.0


def test_fourier_physics_consistency():
    """Solution = random sine series, RHS = eigenvalue-scaled series. FD Laplacian
    of the solution must match the RHS on the interior (physics residual ~ 0) —
    the reference's own generator self-check (reverse.py:332-355)."""
    key = jax.random.PRNGKey(3)
    B, n0, n1 = 2, 96, 80
    max_modes = (4, 4)
    dx = jnp.array([[0.01, 0.013]] * B)
    L = ops.compute_domain_sizes(dx, (n0, n1))
    c = ops.random_series_coefficients(key, B, max_modes)
    soln = ops.synthesize_series(c, None, (n0, n1))[..., None]
    rhs_coeffs = c * ops.laplacian_eigenvalue_factors(L, max_modes)
    rhs = ops.synthesize_series(rhs_coeffs, None, (n0, n1))[..., None]
    lap = ops.apply_fd_operator(soln, dx, 5, 2)
    interior = rhs[:, 2:-2, 2:-2, :]
    rel = float(
        jnp.linalg.norm(lap - interior) / jnp.linalg.norm(interior)
    )
    assert rel < 2e-2, rel


def test_polynomial_roots_to_coefficients():
    # (x + 1)(x + 2) = 2 + 3x + x^2
    c = ops.roots_to_coefficients(jnp.array([[1.0, 2.0]]))
    np.testing.assert_allclose(np.asarray(c[0]), [2.0, 3.0, 1.0], atol=1e-6)


def test_polynomial_second_derivative_exact():
    # p = x^3: p'' = 6x
    coeffs = jnp.array([[0.0, 0.0, 0.0, 1.0]])
    dd = ops.polynomial_derivative_coefficients(coeffs, 2)
    np.testing.assert_allclose(np.asarray(dd[0]), [0.0, 6.0, 0.0, 0.0], atol=1e-6)
    vals = ops.polyval_on_unit_grid(dd, 5)
    np.testing.assert_allclose(np.asarray(vals[0]), 6 * np.linspace(0, 1, 5), atol=1e-5)


def test_random_polynomials_homogeneous_bc():
    key = jax.random.PRNGKey(4)
    p, ddp = ops.random_polynomials_and_second_derivatives(
        key, 4, 6, 33, jnp.ones((4,)), homogeneous_bc=True
    )
    np.testing.assert_allclose(np.asarray(p[:, 0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p[:, -1]), 0.0, atol=1e-5)


def test_random_polynomials_fd_consistency():
    key = jax.random.PRNGKey(5)
    n = 129
    L = jnp.array([2.0, 1.5])
    p, ddp = ops.random_polynomials_and_second_derivatives(
        key, 2, 5, n, L, homogeneous_bc=False
    )
    h = L / (n - 1)
    fd = (p[:, 2:] - 2 * p[:, 1:-1] + p[:, :-2]) / (h**2)[:, None]
    rel = float(jnp.linalg.norm(fd - ddp[:, 1:-1]) / jnp.linalg.norm(ddp[:, 1:-1]))
    assert rel < 1e-2, rel


def test_set_max_magnitude():
    key = jax.random.PRNGKey(6)
    x = jax.random.normal(key, (3, 10, 10, 1))
    y, factors = ops.set_max_magnitude_in_batch_and_return_scaling_factors(x, 1.0)
    np.testing.assert_allclose(
        np.asarray(ops.peak_magnitudes(y)), 1.0, rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) * np.asarray(factors)[:, None, None, None], rtol=1e-6)


def test_set_max_magnitude_masked():
    x = jnp.ones((1, 4, 4, 1)).at[0, 3, 3, 0].set(100.0)
    mask = jnp.ones((1, 4, 4, 1)).at[0, 3, 3, 0].set(0.0)
    y = ops.set_max_magnitude_in_batch(x, 2.0, mask=mask)
    assert float(y[0, 0, 0, 0]) == pytest.approx(2.0)


def test_rot90_matches_numpy():
    x = jnp.arange(24.0).reshape(1, 4, 6, 1)
    for k in range(4):
        got = np.asarray(ops.rot90(x, k))[0, :, :, 0]
        want = np.rot90(np.asarray(x)[0, :, :, 0], k)
        np.testing.assert_array_equal(got, want)


def test_make_shape_mask():
    m = ops.make_shape_mask((4, 5), jnp.array([[2, 3], [4, 5]]))
    assert m.shape == (2, 4, 5, 1)
    assert float(m[0].sum()) == 6.0
    assert float(m[1].sum()) == 20.0


def test_compute_domain_sizes():
    L = ops.compute_domain_sizes(jnp.array([[0.1]]), (11, 21))
    np.testing.assert_allclose(np.asarray(L), [[1.0, 2.0]], rtol=1e-6)


def test_nonuniform_fd_chebyshev_second_derivative():
    """Chebyshev-grid 2nd derivative of cos(x): the reference's own oracle
    (poisson_lhs_matrix.py:215-247)."""
    n = 64
    x = -np.cos(np.pi * np.arange(n) / (n - 1))  # chebyshev points on [-1,1]
    mat = ops.fd.second_derivative_matrix_nonuniform(x)
    f = np.cos(3.0 * x)
    dd = mat @ f
    exact = -9.0 * np.cos(3.0 * x)
    rel = np.linalg.norm(dd[1:-1] - exact[1:-1]) / np.linalg.norm(exact[1:-1])
    assert rel < 2e-2, rel


def test_poisson_lhs_matrix_matches_operator():
    """Dense matrix assembly == matrix-free Dirichlet operator."""
    from poisson_cnn_tpu import solvers

    n0, n1 = 9, 7
    dx = (0.1, 0.2)
    A = ops.fd.poisson_lhs_matrix((n0, n1), dx)
    u = np.random.default_rng(0).normal(size=(n0, n1))
    u[0] = u[-1] = 0.0
    u[:, 0] = u[:, -1] = 0.0
    want = np.asarray(
        solvers.laplacian_dirichlet(
            jnp.asarray(u)[None, ..., None], jnp.asarray([dx])
        )
    )[0, 1:-1, 1:-1, 0]
    got = (A @ u[1:-1, 1:-1].ravel()).reshape(n0 - 2, n1 - 2)
    np.testing.assert_allclose(got, want, rtol=1e-4)
