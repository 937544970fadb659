"""Tests for the extension components: analytical dataset, variable-density
operator/solver, 9-pt conv Laplacian loss, subdomain SPP block, Poisson GAN."""

import math

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from poisson_cnn_tpu import layers, losses, ops, solvers
from poisson_cnn_tpu.data import (
    AnalyticalConfig,
    analytical_solution_for_rhs,
    generate_analytical_batch,
)


def test_analytical_batch_is_exact_pair():
    cfg = AnalyticalConfig(batch_size=3, output_shape=(64, 64), n_modes=(6, 6),
                           domain=(1.0, 1.3), max_magnitude=1.0)
    batch = generate_analytical_batch(jax.random.PRNGKey(0), cfg)
    lap = ops.apply_fd_operator(batch["soln"], batch["dx"], 5, 2)
    rel = float(jnp.linalg.norm(lap - batch["rhs"][:, 2:-2, 2:-2, :])
                / jnp.linalg.norm(batch["rhs"]))
    assert rel < 2e-2, rel
    np.testing.assert_allclose(
        np.asarray(ops.peak_magnitudes(batch["rhs"])), 1.0, rtol=1e-5
    )


def test_analytical_callable_rhs_projection():
    # rhs exactly one eigenmode -> projection recovers the known solution
    Lx, Ly = 1.0, 1.0
    cfg = AnalyticalConfig(output_shape=(48, 48), n_modes=(8, 8), domain=(Lx, Ly))

    def rhs_fn(x, y):
        return jnp.sin(2 * math.pi * x / Lx) * jnp.sin(3 * math.pi * y / Ly)

    rhs_grid, soln_grid = analytical_solution_for_rhs(rhs_fn, cfg)
    lam = -((2 * math.pi / Lx) ** 2 + (3 * math.pi / Ly) ** 2)
    np.testing.assert_allclose(
        np.asarray(soln_grid), np.asarray(rhs_grid) / lam, atol=1e-4
    )


def test_variable_density_reduces_to_laplacian():
    """With rho = 1, div((1/rho) grad u) == standard 5-pt Laplacian."""
    key = jax.random.PRNGKey(1)
    u = jax.random.normal(key, (2, 16, 20, 1))
    rho = jnp.ones_like(u)
    dx = jnp.full((2, 2), 0.1)
    got = solvers.variable_density_operator(u, rho, dx)
    want = ops.apply_fd_operator(u, dx, 3, 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_variable_density_solve_roundtrip():
    key = jax.random.PRNGKey(2)
    u = jax.random.normal(key, (1, 17, 17, 1))
    u = u.at[:, 0].set(0).at[:, -1].set(0).at[:, :, 0].set(0).at[:, :, -1].set(0)
    rho = 1.0 + 0.5 * jax.random.uniform(jax.random.PRNGKey(3), u.shape)
    dx = jnp.full((1, 2), 0.1)
    rhs_int = solvers.variable_density_operator(u, rho, dx)
    rhs = jnp.pad(rhs_int, ((0, 0), (1, 1), (1, 1), (0, 0)))
    u_rec = solvers.variable_density_poisson_solve(rhs, rho, dx, n_iterations=600)
    rel = float(jnp.linalg.norm(u_rec - u) / jnp.linalg.norm(u))
    assert rel < 1e-3, rel


def test_conv_laplacian_losses():
    key = jax.random.PRNGKey(4)
    n = 64
    dx_val = 1.0 / (n - 1)
    x = jnp.linspace(0, 1, n)
    u = (jnp.sin(math.pi * x)[:, None] * jnp.sin(math.pi * x)[None, :])[None, ..., None]
    rhs = -2 * math.pi**2 * u
    dx = jnp.full((1, 1), dx_val)
    l5 = losses.conv_laplacian_loss(rhs, u, dx, "5pt")
    l9 = losses.conv_laplacian_loss(rhs, u, dx, "9pt")
    scale = float(jnp.mean(rhs**2))
    assert float(l5) < 1e-3 * scale
    assert float(l9) < 1e-3 * scale
    rho = jnp.ones_like(u)
    lv = losses.variable_density_loss(rhs, u, rho, dx)
    assert float(lv) < 1e-3 * scale


def test_subdomain_spp_block():
    m = layers.SubdomainSPPBlock(subdomains=(3, 4), spp_levels=(2,), mlp_units=(8, 5))
    x = jnp.ones((2, 30, 40, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 3, 4, 5)


def test_poisson_gan_trains():
    from poisson_cnn_tpu.models import (
        DiscriminatorConfig,
        PoissonDiscriminator,
        UNet,
        UNetConfig,
        make_gan_train_step,
    )

    gen = UNet(UNetConfig(depth=2, root_features=4))
    disc = PoissonDiscriminator(DiscriminatorConfig(filters=(4, 8), mlp_units=(16,)))
    key = jax.random.PRNGKey(5)
    rhs = jax.random.normal(key, (2, 32, 32, 1))
    soln = 0.5 * rhs
    dx = jnp.full((2, 1), 0.03)
    batch = {"rhs": rhs, "soln": soln, "dx": dx}

    gp = gen.init(jax.random.PRNGKey(0), rhs, dx)
    dp = disc.init(jax.random.PRNGKey(1), soln, rhs)
    gen_tx, disc_tx = optax.adam(1e-3), optax.adam(1e-3)
    go, do = gen_tx.init(gp), disc_tx.init(dp)
    step = make_gan_train_step(
        lambda p, r, d: gen.apply(p, r, d), disc, gen_tx, disc_tx
    )
    first = None
    for _ in range(15):
        gp, go, dp, do, metrics = step(gp, go, dp, do, batch)
        if first is None:
            first = float(metrics["gen_loss"])
    assert float(metrics["gen_loss"]) < first
    assert bool(jnp.isfinite(metrics["disc_loss"]))


def test_native_multigrid_matches_spectral():
    """C++ host multigrid (pyamg-equivalent oracle) vs on-device spectral."""
    from poisson_cnn_tpu import native

    if not native.available():
        pytest.skip("no C++ toolchain")
    key = jax.random.PRNGKey(6)
    u = jax.random.normal(key, (2, 33, 33, 1))
    u = u.at[:, 0].set(0).at[:, -1].set(0).at[:, :, 0].set(0).at[:, :, -1].set(0)
    dx = jnp.tile(jnp.asarray([[0.05, 0.04]]), (2, 1))
    rhs = jnp.pad(ops.apply_fd_operator(u, dx, 3, 2), ((0, 0), (1, 1), (1, 1), (0, 0)))
    u_native = native.multigrid_poisson_solve_host(np.asarray(rhs), np.asarray(dx))
    rel = float(np.linalg.norm(u_native - np.asarray(u)) / np.linalg.norm(np.asarray(u)))
    assert rel < 1e-6, rel  # fp64 host solve to tol 1e-10
    # also check it agrees with the on-device spectral solver
    u_sp = solvers.poisson_solve_dirichlet(rhs, dx, mode="fd")
    rel2 = float(np.linalg.norm(u_native - np.asarray(u_sp)) / np.linalg.norm(u_native))
    assert rel2 < 1e-4, rel2
