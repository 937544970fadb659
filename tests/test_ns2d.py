"""Navier–Stokes solver tests. Primary oracle (reference `run_solvers.py`
error_analysis): 2nd-order spatial convergence on the decaying Taylor vortex;
plus divergence-free projection, stability of the driven cavity, and the CNN
pressure-initializer hook."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from poisson_cnn_tpu import ns2d


def _run_taylor(m, n_steps=40, method="alg1", Re=1.0, dt=2.5e-4, pressure_solver=None):
    grid = ns2d.MACGrid(m, m, 0.0, math.pi, 0.0, math.pi)
    problem = ns2d.taylor_vortex(Re=Re)
    cfg = ns2d.NSConfig(method=method, Re=Re, dt=dt, n_steps=n_steps,
                        helmholtz_iterations=80)
    ps = pressure_solver(grid) if pressure_solver else None
    u, v, p = ns2d.run(grid, problem, cfg, ps)
    t_end = cfg.t0 + n_steps * dt
    verr = ns2d.velocity_error(u, v, grid, problem, t_end)
    perr = ns2d.pressure_error(p, grid, problem, t_end)
    return verr, perr, (u, v, p, grid, t_end)


def test_taylor_vortex_accuracy_and_convergence():
    """Velocity error drops at 2nd order with grid refinement (the reference's
    error_analysis oracle, `run_solvers.py`; measured rates 2.1+)."""
    errs = []
    for m in (16, 32):
        verr, _, _ = _run_taylor(m)
        errs.append(verr["u"]["l2"])
    rate = ns2d.convergence_rates([16, 32], errs)
    assert errs[1] < errs[0]
    assert rate > 1.9, (errs, rate)
    # absolute accuracy sanity: error small vs field scale ~1
    assert errs[1] < 5e-3, errs


def test_gauge_method_second_order_and_distinct():
    """The true gauge-variable method converges at 2nd order on the Taylor
    oracle (reference `Gauge_method`, `solvers.py:337-623`) and is a genuinely
    different discretization from alg3 (m accumulates grad(phi))."""
    errs = []
    for m in (16, 32):
        verr, _, _ = _run_taylor(m, method="gauge")
        errs.append(verr["u"]["l2"])
    rate = ns2d.convergence_rates([16, 32], errs)
    assert rate > 1.9, (errs, rate)
    _, _, (u_g, *_rest) = _run_taylor(16, n_steps=20, method="gauge")
    _, _, (u_3, *_rest) = _run_taylor(16, n_steps=20, method="alg3")
    assert float(jnp.abs(u_g - u_3).max()) > 1e-9


def test_taylor_vortex_all_methods_agree():
    base = None
    for method in ("alg1", "alg2", "alg3", "gauge"):
        verr, perr, _ = _run_taylor(16, n_steps=20, method=method)
        assert verr["u"]["l2"] < 1e-2, (method, verr)
        if base is None:
            base = verr["u"]["l2"]
        else:
            assert verr["u"]["l2"] < 10 * base


def test_projection_gives_divergence_free_velocity():
    _, _, (u, v, p, grid, _) = _run_taylor(16, n_steps=5)
    div = ns2d.divergence(u, v, grid)
    assert float(jnp.abs(div).max()) < 1e-4


def test_pressure_recovery():
    _, perr, _ = _run_taylor(32, n_steps=40, method="alg2")
    assert perr["l2"] < 5e-2, perr


def test_driven_cavity_stable():
    grid = ns2d.MACGrid(24, 24, 0.0, 1.0, 0.0, 1.0)
    problem = ns2d.driven_cavity(lid_velocity=1.0, y_top=1.0)
    cfg = ns2d.NSConfig(method="alg1", Re=100.0, dt=2e-3, n_steps=100)
    u, v, p = ns2d.run(grid, problem, cfg)
    assert bool(jnp.isfinite(u).all() and jnp.isfinite(v).all())
    # the lid drags fluid: interior u just below the lid is positive
    assert float(u[grid.m // 2, -1]) > 0.01
    # no-slip at the bottom: small velocity near the wall
    assert abs(float(u[grid.m // 2, 0])) < 0.2


def test_cg_pressure_solver_matches_dct():
    grid = ns2d.MACGrid(16, 16, 0.0, math.pi, 0.0, math.pi)
    x = jnp.asarray(grid.xp)[:, None]
    y = jnp.asarray(grid.yp)[None, :]
    rhs = jnp.cos(x) * jnp.cos(2 * y)  # smooth, zero-mean
    dct = ns2d.dct_pressure_solver(grid)(rhs)
    cg = ns2d.cg_pressure_solver(grid, n_iterations=400)(rhs)
    diff = np.asarray(dct - jnp.mean(dct)) - np.asarray(cg)
    scale = np.abs(np.asarray(dct)).max() + 1e-12
    assert np.abs(diff).max() / scale < 1e-3


def test_cnn_pressure_initializer_hook():
    """A (mock-trained) HPNN warm start must plug into the CG pressure path and
    keep the solver exact: with enough CG iterations results match the DCT."""
    from poisson_cnn_tpu.models import HPNN, HPNNConfig

    grid = ns2d.MACGrid(16, 16, 0.0, math.pi, 0.0, math.pi)
    cfg_model = HPNNConfig(
        pre_filters=(4,), pre_kernel_sizes=(5,),
        deconv_downsampling_factors=(2,), deconv_kernel_sizes=(2,),
        deconv_conv_kernel_sizes=(3,), resize_downsampling_factors=(),
        resize_conv_kernel_sizes=(), resize_methods=(),
        bottleneck_filters=4, bottleneck_n_convs=1,
        final_filters=(4, 1), final_kernel_sizes=(3, 3),
        dx_mlp_units=(8,), bc_type="neumann",
    )
    model = HPNN(cfg_model)
    rhs0 = jnp.ones((1, 16, 16, 1))
    params = model.init(jax.random.PRNGKey(0), rhs0, jnp.full((1, 2), 0.1))
    init = ns2d.cnn_pressure_initializer(model, params, grid)
    solver = ns2d.cg_pressure_solver(grid, n_iterations=300, initializer=init)

    problem = ns2d.taylor_vortex()
    cfg = ns2d.NSConfig(method="alg1", dt=2.5e-4, n_steps=5)
    u, v, p = ns2d.run(grid, problem, cfg, solver)
    assert bool(jnp.isfinite(p).all())
    div = ns2d.divergence(u, v, grid)
    assert float(jnp.abs(div).max()) < 1e-3


def test_cnn_initializer_energy_amplitude():
    """amplitude='energy' is the Galerkin projection onto span{prediction}:
    when the prediction is exactly proportional to the true solution, the
    energy-optimal scale recovers the FULL amplitude (discrete summation by
    parts makes s* exact for the FD-exact DCT solution), unlike 'lstsq' whose
    1/dx^2 high-frequency amplification was the round-2 warm-start killer."""
    import types

    grid = ns2d.MACGrid(32, 32, 0.0, math.pi, 0.0, math.pi)
    solve = ns2d.dct_pressure_solver(grid)
    key = jax.random.PRNGKey(3)
    # smooth random rhs, zero mean (Neumann solvability)
    x = jnp.linspace(0, math.pi, 32)
    X, Y = jnp.meshgrid(x, x, indexing="ij")
    rhs = jnp.cos(X) * jnp.cos(2 * Y) + 0.3 * jnp.cos(3 * X) * jnp.cos(Y)
    exact = solve(rhs)
    exact = exact - jnp.mean(exact)

    # a "model" that predicts the exact solution SHAPE but scaled 10x off
    def apply(params, r, dx):
        return 10.0 * solve(r[0, :, :, 0])[None, :, :, None]

    fake = types.SimpleNamespace(apply=apply)
    init = ns2d.cnn_pressure_initializer(fake, None, grid, amplitude="energy")
    guess = init(rhs)
    err = float(jnp.linalg.norm(guess - exact) / jnp.linalg.norm(exact))
    assert err < 1e-3, err

    # smooth_factor path stays finite and close (smoothing loses a little)
    init_s = ns2d.cnn_pressure_initializer(
        fake, None, grid, amplitude="energy", smooth_factor=4
    )
    gs = init_s(rhs)
    errs = float(jnp.linalg.norm(gs - exact) / jnp.linalg.norm(exact))
    assert bool(jnp.isfinite(gs).all()) and errs < 0.35, errs

    # two-grid pairing: damped-Jacobi presmoothing repairs the smoothed
    # start's high-frequency gap — CG with presmooth converges to the exact
    # solution and the presmoothed smoothed start beats the raw smoothed one
    solver = ns2d.cg_pressure_solver(
        grid, n_iterations=300, initializer=init_s, pre_smooth_iterations=3
    )
    sol = solver(rhs)
    err_cg = float(jnp.linalg.norm(sol - exact) / jnp.linalg.norm(exact))
    assert err_cg < 1e-3, err_cg
    few = ns2d.cg_pressure_solver(
        grid, n_iterations=0, initializer=init_s, pre_smooth_iterations=6
    )(rhs)
    err_few = float(jnp.linalg.norm(few - exact) / jnp.linalg.norm(exact))
    assert err_few < errs, (err_few, errs)


def test_periodic_forcing_problems_linearized():
    """Forced linearized-NS problems track their exact solutions
    (reference structure.py:306-347 capability)."""
    for maker in (ns2d.periodic_forcing_1, ns2d.periodic_forcing_2):
        problem = maker(Re=1.0)
        grid = ns2d.MACGrid(24, 24, 0.0, 1.0, 0.0, 1.0)
        cfg = ns2d.NSConfig(method="alg1", Re=1.0, dt=5e-4, n_steps=40,
                            linearized=True, helmholtz_iterations=80)
        u, v, p = ns2d.run(grid, problem, cfg)
        t_end = cfg.n_steps * cfg.dt
        verr = ns2d.velocity_error(u, v, grid, problem, t_end)
        # field scale is O(0.01..1) at t_end=0.02; demand small relative error
        xu = jnp.asarray(grid.xu)[:, None]
        yu = jnp.asarray(grid.yu)[None, :]
        scale = float(jnp.abs(problem.u_exact(xu, yu, t_end)).max()) + 1e-9
        assert verr["u"]["linf"] / scale < 5e-2, (problem.name, verr, scale)


def test_pressure_gradient_error_and_integrate():
    _, _, (u, v, p, grid, t_end) = _run_taylor(24, n_steps=20, method="alg2")
    problem = ns2d.taylor_vortex()
    gerr = ns2d.pressure_gradient_error(p, grid, problem, t_end)
    assert gerr["gx"]["l2"] < 0.1, gerr
    # integrate: a zero-mean field integrates to ~0, ones to the domain area
    area = ns2d.integrate_centered(np.ones((grid.m, grid.n)), grid)
    assert area == pytest.approx(math.pi**2, rel=1e-6)
    # Simpson mode treats the centered samples as quadrature nodes spanning
    # (n-1) intervals (reference-style constraint row): area is approximate
    area_s = ns2d.integrate_centered(np.ones((grid.m, grid.n)), grid, "simpson")
    assert area_s == pytest.approx(math.pi**2, rel=0.15)
