"""Layer tests: shape/dtype checks, equivalence oracles (per-sample conv vs
vmapped lax.conv; SPP bin math; resize matrices), trainability smoke tests —
following the reference's embedded-main test style (SURVEY.md §4)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from poisson_cnn_tpu import layers, ops


def test_pad_conv_shapes_and_modes():
    x = jnp.ones((2, 16, 20, 3))
    for mode in ("constant", "symmetric", "reflect"):
        m = layers.PadConv(4, 5, "leaky_relu", padding_mode=mode)
        params = m.init(jax.random.PRNGKey(0), x)
        y = m.apply(params, x)
        assert y.shape == (2, 16, 20, 4)


def test_pad_conv_1d():
    x = jnp.ones((2, 33, 2))
    m = layers.PadConv(8, 7, "tanh", padding_mode="symmetric")
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 33, 8)


def test_pad_conv_strided():
    x = jnp.ones((2, 16, 16, 1))
    m = layers.PadConv(4, 3, strides=2)
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 8, 8, 4)


def test_resnet_block_identity_at_zero_init():
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 12, 3))
    m = layers.ResNetBlock(3, 3)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == x.shape


def test_spp_output_size_and_values():
    x = jnp.ones((2, 30, 40, 5))
    out = layers.spatial_pyramid_pool(x, [[2, 2], 3, 5])
    assert out.shape == (2, 4 + 9 + 25)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_spp_uneven_bins_cover_everything():
    # mean of all bin-means at one level == global mean only if bins tile exactly;
    # check bins are disjoint + cover by summing counts via a mask trick
    x = jnp.arange(2 * 7 * 11 * 1, dtype=jnp.float32).reshape(2, 7, 11, 1)
    out = layers.spatial_pyramid_pool(x, [[1, 1]])
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(x.mean(axis=(1, 2, 3))), rtol=1e-6
    )


def test_spp_masked():
    x = jnp.ones((1, 8, 8, 1)).at[0, 4:, :, 0].set(100.0)
    mask = jnp.zeros((1, 8, 8, 1)).at[:, :4, :, :].set(1.0)
    out = layers.spatial_pyramid_pool(x, [[1, 1]], mask=mask)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-6)


def test_upsample_matches_linear_interp():
    x = jnp.arange(5.0).reshape(1, 5, 1, 1)
    m = layers.Upsample("bilinear")
    y = m.apply({}, x, (9, 1))
    np.testing.assert_allclose(np.asarray(y[0, :, 0, 0]), np.linspace(0, 4, 9), atol=1e-6)


def test_upsample_bicubic_interpolates_endpoints():
    x = jnp.arange(6.0).reshape(1, 6, 1, 1) ** 2
    y = layers.Upsample("bicubic").apply({}, x, (11, 1))
    assert float(y[0, 0, 0, 0]) == pytest.approx(0.0, abs=1e-5)
    assert float(y[0, -1, 0, 0]) == pytest.approx(25.0, abs=1e-5)


def test_deconv_upscale_shape():
    x = jnp.ones((2, 8, 10, 3))
    m = layers.DeconvUpscale(4, 5, 2)
    y = m.apply(m.init(jax.random.PRNGKey(0), x, (16, 20)), x, (16, 20))
    assert y.shape == (2, 16, 20, 4)
    # also odd target shapes (variable grids)
    y = m.apply(m.init(jax.random.PRNGKey(0), x, (15, 21)), x, (15, 21))
    assert y.shape == (2, 15, 21, 4)


def test_merge_with_attention_uniform_at_init():
    a = jnp.ones((2, 4, 4, 3))
    b = 3.0 * jnp.ones((2, 4, 4, 3))
    m = layers.MergeWithAttention()
    y = m.apply(m.init(jax.random.PRNGKey(0), [a, b]), [a, b])
    np.testing.assert_allclose(np.asarray(y), 2.0, rtol=1e-6)  # softmax(0,0)=0.5


def test_jacobi_layer_reduces_residual():
    key = jax.random.PRNGKey(2)
    u = jnp.zeros((1, 17, 17, 1))
    rhs = jax.random.normal(key, (1, 17, 17, 1))
    dx = jnp.full((1, 2), 0.1)
    m = layers.JacobiIterationLayer(n_iterations=20)
    out = m.apply({}, u, rhs, dx)
    from poisson_cnn_tpu import solvers
    r0 = jnp.linalg.norm(rhs[:, 1:-1, 1:-1])
    r1 = jnp.linalg.norm((rhs - solvers.laplacian_dirichlet(out, dx))[:, 1:-1, 1:-1])
    assert float(r1) < float(r0)


def test_scaling_layer():
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 1))
    rhs = jax.random.normal(jax.random.PRNGKey(4), (2, 32, 32, 1))
    m = layers.Scaling()
    params = m.init(jax.random.PRNGKey(0), x, rhs)
    y = m.apply(params, x, rhs)
    assert y.shape == x.shape


def test_per_sample_conv_matches_vmapped_lax_conv():
    """Implicit-GEMM per-sample conv must equal a per-sample lax conv."""
    key = jax.random.PRNGKey(5)
    B, H, W, Cin, Cout, k = 3, 10, 11, 2, 4, 3
    x = jax.random.normal(key, (B, H, W, Cin))
    kernels = jax.random.normal(jax.random.PRNGKey(6), (B, Cin, k, k, Cout))

    got = layers.per_sample_conv(x, kernels, padding_mode="constant")

    def one(xb, kb):
        # kb: (Cin, k, k, Cout) -> HWIO (k, k, Cin, Cout)
        w = jnp.transpose(kb, (1, 2, 0, 3))
        return jax.lax.conv_general_dilated(
            xb[None], w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    want = jax.vmap(one)(x, kernels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_per_sample_conv_strided_and_1d():
    x = jax.random.normal(jax.random.PRNGKey(7), (2, 16, 3))
    kernels = jax.random.normal(jax.random.PRNGKey(8), (2, 3, 5, 6))
    y = layers.per_sample_conv(x, kernels, strides=(2,))
    assert y.shape == (2, 8, 6)


def test_per_sample_conv_transpose_identity_kernel():
    """Stride-2 transpose with a delta kernel scatters input onto even sites."""
    x = jnp.arange(8.0).reshape(1, 2, 4, 1) + 1.0
    k = jnp.zeros((1, 1, 1, 1, 1)).at[0, 0, 0, 0, 0].set(1.0)
    y = layers.per_sample_conv_transpose(x, k, stride=2, out_shape=(4, 8))
    assert y.shape == (1, 4, 8, 1)
    np.testing.assert_allclose(float(jnp.sum(jnp.abs(y))), float(jnp.sum(jnp.abs(x))))


def test_meta_conv_forward_and_grad():
    x = jax.random.normal(jax.random.PRNGKey(9), (2, 12, 12, 1))
    dense = jax.random.normal(jax.random.PRNGKey(10), (2, 4))
    m = layers.MetaConv(6, 5, padding_mode="symmetric")
    params = m.init(jax.random.PRNGKey(0), x, dense)
    y = m.apply(params, x, dense)
    assert y.shape == (2, 12, 12, 6)
    g = jax.grad(lambda p: jnp.sum(m.apply(p, x, dense) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


def test_meta_deconv_upscale_shape():
    x = jnp.ones((2, 6, 7, 3))
    dense = jnp.ones((2, 4))
    m = layers.MetaDeconvUpscale(5, 4, 2)
    params = m.init(jax.random.PRNGKey(0), x, dense, (12, 14))
    y = m.apply(params, x, dense, (12, 14))
    assert y.shape == (2, 12, 14, 5)


def test_bottleneck_block_resize_shape():
    x = jnp.ones((2, 48, 40, 4))
    m = layers.BottleneckBlock(
        downsampling_factor=4, filters=8, conv_kernel_size=3, n_convs=2,
        upsample_mode="resize", use_resnet=True,
    )
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert y.shape == (2, 48, 40, 8)


def test_bottleneck_block_deconv_shape():
    x = jnp.ones((2, 48, 40, 4))
    m = layers.BottleneckBlock(
        downsampling_factor=4, filters=8, conv_kernel_size=3, n_convs=1,
        upsample_mode="deconv", deconv_kernel_size=4, downsampling_method="conv",
        conv_downsampling_kernel_size=4,
    )
    y = m.apply(m.init(jax.random.PRNGKey(0), x), x)
    assert y.shape == (2, 48, 40, 8)


def test_meta_bottleneck_block():
    x = jnp.ones((2, 32, 32, 4))
    dense = jnp.ones((2, 6))
    m = layers.MetaBottleneckBlock(
        downsampling_factor=4, filters=8, conv_kernel_size=3, n_convs=2,
        upsample_mode="deconv", deconv_kernel_size=4, use_resnet=True,
    )
    params = m.init(jax.random.PRNGKey(0), x, dense)
    y = m.apply(params, x, dense)
    assert y.shape == (2, 32, 32, 8)


def test_pallas_jacobi_matches_xla_reference():
    """Pallas fused smoother (interpret mode on CPU) == XLA jacobi_smooth."""
    from poisson_cnn_tpu.ops.pallas_kernels import jacobi_smooth_pallas
    from poisson_cnn_tpu.solvers import jacobi_smooth

    key = jax.random.PRNGKey(11)
    u = jnp.zeros((2, 16, 24, 1))
    rhs = jax.random.normal(key, (2, 16, 24, 1))
    dx = jnp.array([[0.1, 0.2], [0.05, 0.07]])
    want = jacobi_smooth(u, rhs, dx, 10, omega=2.0 / 3.0)
    got = jacobi_smooth_pallas(u, rhs, dx, 10, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_per_sample_conv_dilation_matches_lax():
    key = jax.random.PRNGKey(12)
    B, H, W, Cin, Cout, k = 2, 12, 12, 2, 3, 3
    x = jax.random.normal(key, (B, H, W, Cin))
    kernels = jax.random.normal(jax.random.PRNGKey(13), (B, Cin, k, k, Cout))
    got = layers.per_sample_conv(x, kernels, dilation=(2, 2))

    def one(xb, kb):
        w = jnp.transpose(kb, (1, 2, 0, 3))
        return jax.lax.conv_general_dilated(
            xb[None], w, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    want = jax.vmap(one)(x, kernels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_upsample_nearest():
    x = jnp.arange(4.0).reshape(1, 4, 1, 1)
    y = layers.Upsample("nearest").apply({}, x, (8, 1))
    assert y.shape == (1, 8, 1, 1)
    np.testing.assert_allclose(np.asarray(y[0, :2, 0, 0]), [0.0, 0.0])


def test_per_sample_conv_3d_matches_vmapped_lax_conv():
    """3-D implicit-GEMM per-sample conv equals a per-sample lax conv
    (reference dispatches conv3d, `layers/metalearning_conv.py:35-49`)."""
    key = jax.random.PRNGKey(11)
    B, D, H, W, Cin, Cout, k = 2, 6, 7, 8, 2, 3, 3
    x = jax.random.normal(key, (B, D, H, W, Cin))
    kernels = jax.random.normal(jax.random.PRNGKey(12), (B, Cin, k, k, k, Cout))

    got = layers.per_sample_conv(x, kernels, padding_mode="constant")

    def one(xb, kb):
        w = jnp.transpose(kb, (1, 2, 3, 0, 4))  # -> DHWIO
        return jax.lax.conv_general_dilated(
            xb[None], w, (1, 1, 1), [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]

    want = jax.vmap(one)(x, kernels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-4)


def test_jacobi_layer_3d_reduces_residual():
    key = jax.random.PRNGKey(13)
    u = jnp.zeros((1, 9, 9, 9, 1))
    rhs = jax.random.normal(key, (1, 9, 9, 9, 1))
    dx = jnp.full((1, 3), 0.1)
    m = layers.JacobiIterationLayer(n_iterations=20)
    out = m.apply({}, u, rhs, dx)
    from poisson_cnn_tpu import solvers
    interior = (slice(None),) + (slice(1, -1),) * 3
    r0 = jnp.linalg.norm(rhs[interior])
    r1 = jnp.linalg.norm((rhs - solvers.laplacian_dirichlet(out, dx))[interior])
    assert float(r1) < float(r0)
