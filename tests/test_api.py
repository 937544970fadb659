"""Production inference API (`poisson_cnn_tpu.api`) over the in-repo trained
artifacts: one-call physical-amplitude solves, input-shape flexibility,
boundary superposition. Uses the shipped checkpoints (checkpoints/hpnn_fast,
checkpoints/dbcnn_fast) — these tests double as artifact-integrity checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from poisson_cnn_tpu.api import PoissonSolver
from poisson_cnn_tpu.data import GridSamplingConfig, ReverseConfig, generate_batch
from poisson_cnn_tpu.solvers import poisson_solve_dirichlet


@pytest.fixture(scope="module")
def solver():
    return PoissonSolver()


def _rel_l2(pred, truth):
    pred = np.asarray(pred, np.float64).reshape(pred.shape[0], -1)
    truth = np.asarray(truth, np.float64).reshape(truth.shape[0], -1)
    return np.linalg.norm(pred - truth, axis=1) / np.linalg.norm(truth, axis=1)


def test_homogeneous_solve_physical_amplitude(solver):
    """solve() must return the PHYSICAL field (not the network's unit-peak
    shape): batched series rhs at an amplitude far from 1."""
    cfg = ReverseConfig(
        batch_size=4,
        grids=GridSamplingConfig(((65, 65), (65, 65)), (5e-3, 5e-3)),
        fourier_mode_range=(1, 4),
    )
    batch = generate_batch(jax.random.PRNGKey(0), cfg, (65, 65))
    rhs = batch["rhs"] * 37.0  # arbitrary physical amplitude
    truth = poisson_solve_dirichlet(rhs, batch["dx"], mode="fd")
    pred = solver.solve(rhs, batch["dx"])
    errs = _rel_l2(pred, truth)
    assert errs.mean() < 0.12, errs  # bench artifact holds ~3-5% in-family


def test_input_shape_flexibility(solver):
    """(H, W) + scalar dx must behave exactly like the canonical batch form."""
    key = jax.random.PRNGKey(1)
    cfg = ReverseConfig(
        batch_size=1,
        grids=GridSamplingConfig(((65, 65), (65, 65)), (1e-2, 1e-2)),
        fourier_mode_range=(1, 3),
    )
    rhs4 = generate_batch(key, cfg, (65, 65))["rhs"]
    u_batch = solver.solve(rhs4, jnp.full((1, 2), 1e-2))
    u_single = solver.solve(rhs4[0, :, :, 0], 1e-2)
    assert u_single.shape == (65, 65)
    np.testing.assert_allclose(
        np.asarray(u_single), np.asarray(u_batch[0, :, :, 0]), rtol=0, atol=1e-5
    )


def test_boundary_superposition(solver):
    """Laplace problem (rhs=0) with one nonzero edge: the PCNN path must beat
    the trivial zero guess by a wide margin and honor the edge location."""
    H = W = 65
    dx = jnp.full((1, 2), 1e-2)
    x = jnp.linspace(0, jnp.pi, W)
    left = (jnp.sin(x) + 0.3 * jnp.sin(3 * x))[None, :, None] * 2.5

    # spectral truth by BC lifting: solve lap(u)=0 with u(0,:)=left
    rhs = jnp.zeros((1, H, W, 1))
    lift = jnp.zeros((1, H, W, 1)).at[:, 0, :, 0].set(left[:, :, 0])
    # residual trick: u = lift + v, lap(v) = -lap(lift) with v|boundary=0
    from poisson_cnn_tpu.ops import apply_fd_operator

    lap_lift = jnp.zeros_like(rhs)
    lap_lift = lap_lift.at[:, 1:-1, 1:-1, :].set(
        apply_fd_operator(lift, jnp.broadcast_to(dx, (1, 2)), 3, 2)[:, :, :, :]
    )
    v = poisson_solve_dirichlet(-lap_lift, dx, mode="fd")
    truth = lift + v

    pred = solver.solve(rhs, dx, boundaries={"left": left})
    err = _rel_l2(pred, truth)[0]
    assert err < 0.15, err
    # edge trace must match the prescribed BC closely
    edge_err = float(jnp.abs(pred[0, 0, :, 0] - left[0, :, 0]).max())
    assert edge_err < 0.2 * float(jnp.abs(left).max())


def test_homogeneous_solve_3d(solver):
    """(D, H, W) input routes to the 3-D artifact and returns the physical
    field (3-D v4 holds 5.9% in-family; allow slack for one random sample)."""
    from poisson_cnn_tpu.data.reverse_nd import ReverseNDConfig, generate_batch_nd

    cfg = ReverseNDConfig(batch_size=2, dx_range=(1e-2, 1e-2),
                          fourier_mode_range=(1, 3))
    batch = generate_batch_nd(jax.random.PRNGKey(3), cfg, (33, 33, 33))
    rhs = batch["rhs"] * 12.5
    truth = poisson_solve_dirichlet(rhs, batch["dx"], mode="fd")
    pred = solver.solve(rhs, batch["dx"])
    assert pred.shape == rhs.shape
    errs = _rel_l2(pred, truth)
    assert errs.mean() < 0.15, errs
    # single-sample (D,H,W) form
    u1 = solver.solve(rhs[0, :, :, :, 0], batch["dx"][0])
    assert u1.shape == (33, 33, 33)
    np.testing.assert_allclose(
        np.asarray(u1), np.asarray(pred[0, ..., 0]), rtol=0, atol=1e-5
    )


def test_unknown_boundary_key_rejected(solver):
    with pytest.raises(ValueError, match="unknown boundary"):
        solver.solve(jnp.zeros((1, 65, 65, 1)), 1e-2, boundaries={"north": jnp.ones(65)})


def test_solve_exact_matches_spectral(solver):
    rhs = jax.random.normal(jax.random.PRNGKey(2), (2, 33, 49, 1))
    dx = jnp.full((2, 2), 1e-2)
    np.testing.assert_allclose(
        np.asarray(solver.solve_exact(rhs, dx)),
        np.asarray(poisson_solve_dirichlet(rhs, dx, mode="fd")),
        atol=1e-6,
    )


@pytest.fixture(scope="module")
def neumann_solver():
    return PoissonSolver(bc_type="neumann")


def test_neumann_route_in_family(neumann_solver):
    """bc_type='neumann' solves a cosine-series (in-family) problem with
    physical amplitude against the DCT-I vertex oracle (the reference's
    deployed NS configuration, `Navier_Stokes_2D/solvers.py:29-33`)."""
    cfg = ReverseConfig(
        batch_size=4,
        grids=GridSamplingConfig(((65, 65), (65, 65)), (5e-3, 5e-3)),
        fourier_mode_range=(1, 4),
        bc="neumann",
        include_taylor=False,
    )
    batch = generate_batch(jax.random.PRNGKey(3), cfg, (65, 65))
    rhs = batch["rhs"] * 11.0
    pred = np.asarray(neumann_solver.solve(rhs, batch["dx"]))
    truth = np.asarray(neumann_solver.solve_exact(rhs, batch["dx"]))
    # Neumann fields are defined up to a constant: compare mean-removed
    pred = pred - pred.mean(axis=(1, 2, 3), keepdims=True)
    truth = truth - truth.mean(axis=(1, 2, 3), keepdims=True)
    errs = _rel_l2(jnp.asarray(pred), jnp.asarray(truth))
    assert errs.mean() < 0.2, errs  # artifact holds 5.7% in-family


def test_neumann_route_rejects_boundaries_and_3d(neumann_solver):
    with pytest.raises(ValueError, match="Dirichlet-only"):
        neumann_solver.solve(
            jnp.zeros((1, 33, 33, 1)), 1e-2, boundaries={"left": jnp.ones(33)}
        )
    with pytest.raises(ValueError, match="2-D"):
        neumann_solver.solve(jnp.zeros((1, 17, 17, 17, 1)), jnp.full((1, 3), 1e-2))


def test_refine_iterations_cuts_out_of_family_error(solver):
    """refine_iterations=k (anchor-started CG residual correction) must beat
    the raw route on rough coarse-noise rhs — the round-5 p90-tail fix
    (study: checkpoints/refine_option.json)."""
    from poisson_cnn_tpu.data.numerical import _random_coarse_noise_nd
    from poisson_cnn_tpu.solvers import laplacian_dirichlet

    rhs = _random_coarse_noise_nd(jax.random.PRNGKey(5), 4, (65, 65), (0.5, 1.5))
    dx = jnp.full((4, 2), 1.5e-2)
    truth = poisson_solve_dirichlet(rhs, dx, mode="fd")
    refined_solver = PoissonSolver(
        hpnn_dir=solver.hpnn_dir, dbcnn_dir=solver.dbcnn_dir, refine_iterations=8
    )
    err_raw = _rel_l2(solver.solve(rhs, dx), truth)
    err_ref = _rel_l2(refined_solver.solve(rhs, dx), truth)
    assert err_ref.mean() < err_raw.mean()
    assert err_ref.mean() < 0.06, (err_raw.mean(), err_ref.mean())
    # the refined field also satisfies the PDE much better
    def resid(u):
        r = np.asarray(rhs - laplacian_dirichlet(u, dx))[:, 1:-1, 1:-1]
        return np.linalg.norm(r.reshape(4, -1), axis=1)
    assert resid(refined_solver.solve(rhs, dx)).mean() < 0.5 * resid(
        solver.solve(rhs, dx)
    ).mean()


def test_refine_preserves_nonzero_boundaries(solver):
    """On the superposition route the CG correction solves the
    homogeneous-Dirichlet ERROR equation, so the imposed edge values must
    survive bit-exactly."""
    H = W = 49
    left = jnp.sin(jnp.linspace(0, jnp.pi, W))[None, :, None]
    rhs = jnp.zeros((1, H, W, 1))
    dx = jnp.full((1, 2), 1e-2)
    refined_solver = PoissonSolver(
        hpnn_dir=solver.hpnn_dir, dbcnn_dir=solver.dbcnn_dir, refine_iterations=6
    )
    u0 = solver.solve(rhs, dx, boundaries={"left": left})
    u1 = refined_solver.solve(rhs, dx, boundaries={"left": left})
    np.testing.assert_array_equal(np.asarray(u1[:, 0, :, :]), np.asarray(u0[:, 0, :, :]))
    np.testing.assert_array_equal(np.asarray(u1[:, -1, :, :]), np.asarray(u0[:, -1, :, :]))
    np.testing.assert_array_equal(np.asarray(u1[:, :, 0, :]), np.asarray(u0[:, :, 0, :]))
    np.testing.assert_array_equal(np.asarray(u1[:, :, -1, :]), np.asarray(u0[:, :, -1, :]))
    # and the interior residual of the Laplace problem improves
    from poisson_cnn_tpu.solvers import laplacian_dirichlet

    def interior_resid(u):
        full = -np.asarray(laplacian_dirichlet(u, dx))[:, 1:-1, 1:-1]
        return np.linalg.norm(full.reshape(1, -1), axis=1)

    assert interior_resid(u1) < interior_resid(u0)


def test_refine_rejected_for_neumann():
    with pytest.raises(ValueError, match="Dirichlet-only"):
        PoissonSolver(bc_type="neumann", refine_iterations=4)
