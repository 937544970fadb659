"""Curved-boundary machinery (misc.Boundary1D) vs closed-form oracles.

Reference behavior being matched: `poisson_CNN/misc/Boundary.py:14-143`
(spline boundary, tangents/normals, Dirichlet/Neumann/Robin residual under
GL quadrature, tangential-derivative regularizer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poisson_cnn_tpu.misc import Boundary1D, SplineCurve, natural_cubic_spline


def circle_coords(n=200, r=1.0):
    th = np.linspace(0.0, 2 * np.pi, n)
    return np.stack([r * np.cos(th), r * np.sin(th)], axis=1)


def test_spline_interpolates_and_differentiates():
    t = np.linspace(0.0, 2.0, 21)
    y = np.sin(t)
    sp = SplineCurve.fit(t, y)
    # interior points: the natural BC (s''=0) is wrong for sin at t=2, so the
    # last knot intervals carry O(h^2) local error by construction
    tq = jnp.linspace(0.3, 1.7, 57)
    assert np.allclose(np.asarray(sp(tq)), np.sin(np.asarray(tq)), atol=5e-4)
    assert np.allclose(
        np.asarray(sp.derivative(tq)), np.cos(np.asarray(tq)), atol=5e-3
    )


def test_natural_cubic_matches_scipy():
    scipy_interp = pytest.importorskip("scipy.interpolate")
    t = np.array([0.0, 0.7, 1.1, 2.0, 3.2])
    y = np.array([1.0, -0.3, 0.5, 2.0, 0.1])
    ours = natural_cubic_spline(t, y)
    ref = scipy_interp.CubicSpline(t, y, bc_type="natural")
    tq = np.linspace(0.0, 3.2, 100)
    sp = SplineCurve.fit(t, y)
    assert np.allclose(np.asarray(sp(jnp.asarray(tq))), ref(tq), atol=1e-4)
    assert ours.shape == (4, 4)


def test_normals_point_outward_on_ccw_circle():
    b = Boundary1D.from_coordinates("dirichlet", circle_coords())
    tq = jnp.linspace(0.1, b.t_range[1] - 0.1, 37)
    pts = np.asarray(b.points(tq))
    nrm = np.asarray(b.normals(tq, unit=True))
    # outward normal of a CCW circle is the radial direction
    radial = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    assert np.allclose(nrm, radial, atol=5e-3)


def test_dirichlet_error_zero_for_exact_model():
    # u = x^2 - y^2 is harmonic; on the unit circle u = cos(2*theta)
    b = Boundary1D.from_coordinates("dirichlet", circle_coords(400))
    model = lambda x, y: x**2 - y**2
    g = lambda x, y: x**2 - y**2
    err = float(b.evaluate_error(model, g, n_quadpts=20))
    assert err < 1e-3
    # and a wrong model scores clearly nonzero
    err_bad = float(b.evaluate_error(lambda x, y: x * 0.0, g, n_quadpts=20))
    assert err_bad > 0.1


def test_neumann_error_zero_for_exact_model():
    # du/dn on unit circle for u = x^2 - y^2: grad = (2x, -2y), n = (x, y)
    # -> du/dn = 2x^2 - 2y^2
    b = Boundary1D.from_coordinates("neumann", circle_coords(400))
    model = lambda x, y: x**2 - y**2
    g = lambda x, y: 2 * x**2 - 2 * y**2
    err = float(b.evaluate_error(model, g, n_quadpts=20))
    assert err < 5e-3


def test_robin_error_and_orientation_flip():
    alpha = 0.7
    model = lambda x, y: x**2 - y**2
    g = lambda x, y: (2 + alpha) * (x**2 - y**2)  # du/dn + alpha*u on circle
    b = Boundary1D.from_coordinates("robin", circle_coords(400), robin_alpha=alpha)
    assert float(b.evaluate_error(model, g, n_quadpts=20)) < 5e-3
    # clockwise orientation flips the normal -> -du/dn + alpha*u
    b_cw = Boundary1D.from_coordinates(
        "robin", circle_coords(400), robin_alpha=alpha, orientation="clockwise"
    )
    g_cw = lambda x, y: (-2 + alpha) * (x**2 - y**2)
    assert float(b_cw.evaluate_error(model, g_cw, n_quadpts=20)) < 5e-3


def test_parametric_rhs_and_derivative_regularizer():
    b = Boundary1D.from_coordinates(
        "dirichlet",
        circle_coords(400),
        derivative_regularizer_coefficient=0.5,
    )
    model = lambda x, y: x**2 - y**2
    # parametric rhs: t is arc length ~ theta on the unit circle
    g_param = lambda t: jnp.cos(2 * t / b.t_range[1] * 2 * jnp.pi)
    err = float(
        b.evaluate_error(model, g_param, n_quadpts=24, parametric_rhs=True)
    )
    assert np.isfinite(err) and err < 0.1


def test_error_is_differentiable_wrt_model_params():
    b = Boundary1D.from_coordinates("dirichlet", circle_coords(100))
    g = lambda x, y: x**2 - y**2

    def loss(w):
        model = lambda x, y: w * (x**2 - y**2)
        return b.evaluate_error(model, g, n_quadpts=8)

    grad = float(jax.grad(loss)(0.5))
    assert np.isfinite(grad) and grad < 0.0  # moving w toward 1 reduces error
