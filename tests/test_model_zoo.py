"""Tests for the baseline/auxiliary model families: UNet, pix2pix, DBC-RNN,
Fourier autoencoder, metalearning HPNN/DBCNN. Variable-shape sweeps follow the
reference's UNet robustness loop (`models/UNet.py:316-329`)."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from poisson_cnn_tpu.models import (
    DBCRNN,
    DBCRNNConfig,
    FourierAutoencoderHPNN,
    FourierAutoencoderConfig,
    MetaDBCNN,
    MetaDBCNNConfig,
    MetaHPNN,
    MetaHPNNConfig,
    Pix2PixGenerator,
    Pix2PixConfig,
    UNet,
    UNetConfig,
)


def test_unet_variable_shapes():
    model = UNet(UNetConfig(depth=3, root_features=4))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 48, 48, 1)), dx)
    # odd sizes exercise the crop/pad in the decoder (reference loops 97..104)
    for shape in [(48, 48), (49, 52), (41, 37)]:
        out = model.apply(params, jnp.ones((2,) + shape + (1,)), dx)
        assert out.shape == (2,) + shape + (1,), shape


def test_unet_trains():
    model = UNet(UNetConfig(depth=2, root_features=4))
    key = jax.random.PRNGKey(1)
    rhs = jax.random.normal(key, (2, 32, 32, 1))
    target = 2.0 * rhs
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(
            lambda p: jnp.mean((model.apply(p, rhs, dx) - target) ** 2)
        )(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    l0 = None
    for i in range(30):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.5 * l0


def test_pix2pix_generator_shape():
    model = Pix2PixGenerator(Pix2PixConfig(encoder_filters=(8, 16, 32),
                                           decoder_filters=(16, 8)))
    x = jnp.ones((2, 64, 64, 1))
    params = model.init(jax.random.PRNGKey(0), x)
    out = model.apply(params, x)
    assert out.shape == (2, 64, 64, 1)


def test_dbc_rnn_forward():
    model = DBCRNN(DBCRNNConfig(hidden_size=16, n_layers=2, strip_width=4))
    bc = jax.random.normal(jax.random.PRNGKey(2), (2, 24, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), bc, dx, 32)
    out = model.apply(params, bc, dx, 32)
    assert out.shape == (2, 32, 24, 1)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(bc), atol=1e-6)
    # gru variant
    model_g = DBCRNN(DBCRNNConfig(hidden_size=8, n_layers=1, cell="gru", strip_width=4))
    params_g = model_g.init(jax.random.PRNGKey(0), bc, dx, 16)
    assert model_g.apply(params_g, bc, dx, 16).shape == (2, 16, 24, 1)


def test_fourier_autoencoder_resolution_independence():
    """The decoder is an analytic sine series: same params can emit any
    resolution, and the output respects homogeneous Dirichlet BCs exactly."""
    model = FourierAutoencoderHPNN(
        FourierAutoencoderConfig(encoder_filters=(8, 16), n_modes=6,
                                 mlp_units=(32,))
    )
    rhs = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    out = model.apply(params, rhs, dx)
    assert out.shape == (2, 32, 32, 1)
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out[:, :, -1]), 0.0, atol=1e-5)
    out_big = model.apply(params, rhs, dx, out_shape=(96, 80))
    assert out_big.shape == (2, 96, 80, 1)


def test_meta_hpnn_forward_and_grads():
    model = MetaHPNN(MetaHPNNConfig(
        pre_filters=(4,), pre_kernel_sizes=(5,),
        bottleneck_downsampling_factors=(2,), bottleneck_conv_kernel_sizes=(3,),
        bottleneck_deconv_kernel_sizes=(2,), bottleneck_upsample_modes=("deconv",),
        bottleneck_filters=8, bottleneck_n_convs=1,
        final_filters=(8, 1), final_kernel_sizes=(3, 3), hidden_units=(8, 8),
    ))
    rhs = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    out = model.apply(params, rhs, dx)
    assert out.shape == rhs.shape
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, rhs, dx) ** 2))(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))


def test_meta_dbcnn_forward():
    model = MetaDBCNN(MetaDBCNNConfig(
        boundary_filters=(4, 8), boundary_kernel_sizes=(7, 5),
        spp_levels=(2, 3), mlp_units=(16,), n_modes=8,
        final_filters=(4, 1), final_kernel_sizes=(3, 3), hidden_units=(8, 8),
    ))
    bc = jax.random.normal(jax.random.PRNGKey(5), (2, 24, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), bc, dx, 20)
    out = model.apply(params, bc, dx, 20)
    assert out.shape == (2, 20, 24, 1)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(bc), atol=1e-6)


def test_fluidnet_hpnn_forward_and_bc():
    from poisson_cnn_tpu.models import FluidnetHPNN, FluidnetHPNNConfig

    model = FluidnetHPNN(FluidnetHPNNConfig(
        pool_sizes=(1, 2, 4), branch_filters=(8, 8),
        branch_kernel_sizes=(5, 3), dx_mlp_units=(16,),
    ))
    rhs = jax.random.normal(jax.random.PRNGKey(6), (2, 40, 48, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    out = model.apply(params, rhs, dx)
    assert out.shape == rhs.shape
    np.testing.assert_allclose(np.asarray(out[:, 0]), 0.0, atol=1e-6)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, rhs, dx) ** 2))(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))
