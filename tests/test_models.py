"""Model tests: shape sweeps over variable grids, BC enforcement, gradient
flow, overfit-a-tiny-batch trainability (SURVEY.md §4 strategy)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from poisson_cnn_tpu import losses, ops
from poisson_cnn_tpu.models import (
    DBCNN,
    DBCNNConfig,
    HPNN,
    HPNNConfig,
    PCNN,
    PCNNConfig,
    stable_sinh_modes,
)


SMALL_HPNN = HPNNConfig(
    pre_filters=(4, 8),
    pre_kernel_sizes=(7, 5),
    deconv_downsampling_factors=(2, 4),
    deconv_kernel_sizes=(2, 4),
    deconv_conv_kernel_sizes=(5, 3),
    resize_downsampling_factors=(8,),
    resize_conv_kernel_sizes=(3,),
    resize_methods=("bilinear",),
    bottleneck_filters=8,
    bottleneck_n_convs=1,
    final_filters=(8, 4, 1),
    final_kernel_sizes=(5, 3, 3),
    dx_mlp_units=(16, 16),
)

SMALL_DBCNN = DBCNNConfig(
    boundary_filters=(4, 8),
    boundary_kernel_sizes=(7, 5),
    spp_levels=(2, 3, 5),
    mlp_units=(32, 16),
    n_modes=8,
    final_filters=(6, 3, 1),
    final_kernel_sizes=(5, 3, 3),
    final_regular_conv_stages=1,
)


def test_hpnn_forward_shapes_variable_grids():
    model = HPNN(SMALL_HPNN)
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 48, 48, 1)), dx)
    for shape in [(48, 48), (64, 40), (33, 57)]:
        rhs = jnp.ones((2,) + shape + (1,))
        out = model.apply(params, rhs, dx)
        assert out.shape == rhs.shape, shape


def test_hpnn_branch_names_shape_independent():
    """Branch param names derive from the enumeration position, not from the
    count of non-skipped branches: with a resize factor SMALLER than the
    largest deconv factor, params initialized at a big grid (all branches
    live) must apply at a small grid where the deconv branch is skipped —
    the surviving resize branch keeps its own (resize-structured) params."""
    cfg = dataclasses.replace(
        SMALL_HPNN,
        deconv_downsampling_factors=(8,), deconv_kernel_sizes=(8,),
        deconv_conv_kernel_sizes=(3,),
        resize_downsampling_factors=(2,), resize_conv_kernel_sizes=(3,),
        resize_methods=("bilinear",),
    )
    model = HPNN(cfg)
    dx = jnp.full((1, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 32, 32, 1)), dx)
    names = set(params["params"].keys())
    assert {"BottleneckBlock_0", "BottleneckBlock_1"} <= names
    # grid 8: min(shape) < 2*8 skips the deconv branch; the resize branch must
    # still bind to BottleneckBlock_1 (a deconv-vs-resize structure mismatch
    # raises in flax apply)
    out = model.apply(params, jnp.ones((1, 8, 8, 1)), dx)
    assert out.shape == (1, 8, 8, 1)


def test_hpnn_dirichlet_boundary_zero():
    model = HPNN(SMALL_HPNN)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (2, 48, 48, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    out = model.apply(params, rhs, dx)
    for sl in (out[:, 0], out[:, -1], out[:, :, 0], out[:, :, -1]):
        np.testing.assert_allclose(np.asarray(sl), 0.0, atol=1e-6)


def test_hpnn_neumann_boundary_mirrors_interior():
    import dataclasses

    cfg = dataclasses.replace(SMALL_HPNN, bc_type="neumann")
    model = HPNN(cfg)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 1))
    dx = jnp.full((1, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    out = model.apply(params, rhs, dx)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]), atol=1e-6)


def test_hpnn_gradients_flow():
    model = HPNN(SMALL_HPNN)
    rhs = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 48, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, rhs, dx) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    nonzero = sum(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.5


def test_hpnn_overfits_tiny_batch():
    """Trainability oracle: loss on one fixed batch decreases under adam."""
    model = HPNN(SMALL_HPNN)
    key = jax.random.PRNGKey(3)
    B, n = 2, 48
    dx = jnp.full((B, 1), 2.0 / (n - 1))
    c = ops.random_series_coefficients(key, B, (3, 3))
    L = ops.compute_domain_sizes(dx, (n, n))
    soln = ops.synthesize_series(c, None, (n, n))[..., None]
    rhs = ops.synthesize_series(
        c * ops.laplacian_eigenvalue_factors(L, (3, 3)), None, (n, n)
    )[..., None]
    rhs, f = ops.set_max_magnitude_in_batch_and_return_scaling_factors(rhs, 1.0)
    soln = soln * f[:, None, None, None]

    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, rhs, dx)
            return jnp.mean((pred - soln) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_seq = []
    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
        losses_seq.append(float(loss))
    assert losses_seq[-1] < 0.5 * losses_seq[0], losses_seq[::10]


def test_sinh_modes_stable_and_normalized():
    s = stable_sinh_modes(64, 50)  # reference warns above 27 modes; we don't care
    assert bool(jnp.isfinite(s).all())
    np.testing.assert_allclose(np.asarray(jnp.abs(s).max(axis=1)), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s[:, -1]), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s[:, 0]), -1.0, rtol=1e-5)


def test_dbcnn_forward_and_bc_row():
    model = DBCNN(SMALL_DBCNN)
    bc = jax.random.normal(jax.random.PRNGKey(4), (2, 40, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), bc, dx, 32)
    out = model.apply(params, bc, dx, 32)
    assert out.shape == (2, 32, 40, 1)
    np.testing.assert_allclose(np.asarray(out[:, 0, :, :]), np.asarray(bc), atol=1e-6)
    # variable output resolution
    out2 = model.apply(params, bc, dx, 48)
    assert out2.shape == (2, 48, 40, 1)


def test_pcnn_superposition_bc_traces():
    """Each boundary of the combined prediction reproduces its BC (the other
    four fields vanish there only approximately, so check the dominant terms:
    with rhs=0 and a single nonzero edge, the trace must equal that edge's BC)."""
    cfg = PCNNConfig(hpnn=SMALL_HPNN, dbcnn=SMALL_DBCNN)
    model = PCNN(cfg)
    B, H, W = 1, 48, 40
    rhs = jnp.zeros((B, H, W, 1))
    dx = jnp.full((B, 1), 0.02)
    zeros_w = jnp.zeros((B, W, 1))
    zeros_h = jnp.zeros((B, H, 1))
    left = jax.random.normal(jax.random.PRNGKey(5), (B, W, 1))
    params = model.init(
        jax.random.PRNGKey(0), rhs, left, zeros_h, zeros_w, zeros_h, dx
    )

    out = model.apply(params, rhs, left, zeros_h, zeros_w, zeros_h, dx)
    assert out.shape == rhs.shape
    # hpnn on rhs=0 still outputs something small but nonzero; dominant check:
    # left trace should correlate strongly with the left bc
    trace = np.asarray(out[:, 0, :, 0])
    bc = np.asarray(left[:, :, 0])
    corr = np.corrcoef(trace.ravel(), bc.ravel())[0, 1]
    assert corr > 0.99, corr

    # top edge: feed top bc only, check trace at j=0
    top = jax.random.normal(jax.random.PRNGKey(6), (B, H, 1))
    out_t = model.apply(params, rhs, zeros_w, top, zeros_w, zeros_h, dx)
    corr_t = np.corrcoef(
        np.asarray(out_t[:, :, 0, 0]).ravel(), np.asarray(top[:, :, 0]).ravel()
    )[0, 1]
    assert corr_t > 0.99, corr_t

    # right edge
    right = jax.random.normal(jax.random.PRNGKey(7), (B, W, 1))
    out_r = model.apply(params, rhs, zeros_w, zeros_h, right, zeros_h, dx)
    corr_r = np.corrcoef(
        np.asarray(out_r[:, -1, :, 0]).ravel(), np.asarray(right[:, :, 0]).ravel()
    )[0, 1]
    assert corr_r > 0.99, corr_r

    # bottom edge
    bottom = jax.random.normal(jax.random.PRNGKey(8), (B, H, 1))
    out_b = model.apply(params, rhs, zeros_w, zeros_h, zeros_w, bottom, dx)
    corr_b = np.corrcoef(
        np.asarray(out_b[:, :, -1, 0]).ravel(), np.asarray(bottom[:, :, 0]).ravel()
    )[0, 1]
    assert corr_b > 0.99, corr_b


def test_pcnn_zero_bcs_no_nan():
    """All-zero BCs must produce finite output (reference would NaN here)."""
    cfg = PCNNConfig(hpnn=SMALL_HPNN, dbcnn=SMALL_DBCNN)
    model = PCNN(cfg)
    B, H, W = 1, 48, 40
    rhs = jax.random.normal(jax.random.PRNGKey(9), (B, H, W, 1))
    dx = jnp.full((B, 1), 0.02)
    z_w, z_h = jnp.zeros((B, W, 1)), jnp.zeros((B, H, 1))
    params = model.init(jax.random.PRNGKey(0), rhs, z_w, z_h, z_w, z_h, dx)
    out = model.apply(params, rhs, z_w, z_h, z_w, z_h, dx)
    assert bool(jnp.isfinite(out).all())


def test_hpnn_output_scaling_modes():
    """Reference output-scaling modes (process_output_scaling_modes)."""
    import dataclasses

    rhs = 3.0 * jax.random.normal(jax.random.PRNGKey(20), (2, 48, 48, 1))
    dx = jnp.full((2, 1), 0.02)
    for mode in (
        None,
        "rhs_max_magnitude",
        "max_domain_size_squared",
        "rhs_max_magnitude_and_max_domain_size_squared",
        "soln_max_magnitude",
        "match_peak_laplacian_magnitude_to_peak_rhs",
    ):
        cfg = dataclasses.replace(
            SMALL_HPNN, output_scaling=mode, normalize_rhs_max_magnitude=True
        )
        model = HPNN(cfg)
        params = model.init(jax.random.PRNGKey(0), rhs, dx)
        out = model.apply(params, rhs, dx)
        assert out.shape == rhs.shape and bool(jnp.isfinite(out).all()), mode
        if mode == "soln_max_magnitude":
            np.testing.assert_allclose(
                np.asarray(ops.peak_magnitudes(out)), 1.0, rtol=1e-5
            )
        if mode == "match_peak_laplacian_magnitude_to_peak_rhs":
            lap = ops.apply_fd_operator(out, jnp.broadcast_to(dx, (2, 2)), 5, 2)
            np.testing.assert_allclose(
                np.asarray(ops.peak_magnitudes(lap)),
                np.asarray(ops.peak_magnitudes(rhs)),
                rtol=1e-3,
            )
    with pytest.raises(ValueError):
        dataclasses.replace(SMALL_HPNN, output_scaling="bogus")


def test_hpnn_remat_branches_matches_plain():
    """remat_branches changes memory use, not values or gradients."""
    import dataclasses

    rhs = jax.random.normal(jax.random.PRNGKey(30), (2, 48, 48, 1))
    dx = jnp.full((2, 1), 0.02)
    m0 = HPNN(SMALL_HPNN)
    m1 = HPNN(dataclasses.replace(SMALL_HPNN, remat_branches=True))
    params = m0.init(jax.random.PRNGKey(0), rhs, dx)
    y0 = m0.apply(params, rhs, dx)
    y1 = m1.apply(params, rhs, dx)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-6)
    g0 = jax.grad(lambda p: jnp.sum(m0.apply(p, rhs, dx) ** 2))(params)
    g1 = jax.grad(lambda p: jnp.sum(m1.apply(p, rhs, dx) ** 2))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g0), jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_models_with_postsmoother():
    """Jacobi postsmoother paths inside HPNN and DBCNN."""
    import dataclasses

    cfg = dataclasses.replace(SMALL_HPNN, postsmoother_iterations=3)
    m = HPNN(cfg)
    rhs = jax.random.normal(jax.random.PRNGKey(40), (1, 48, 48, 1))
    dx = jnp.full((1, 1), 0.02)
    params = m.init(jax.random.PRNGKey(0), rhs, dx)
    out = m.apply(params, rhs, dx)
    assert bool(jnp.isfinite(out).all())
    g = jax.grad(lambda p: jnp.sum(m.apply(p, rhs, dx) ** 2))(params)
    assert all(bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g))

    dcfg = dataclasses.replace(SMALL_DBCNN, postsmoother_iterations=2)
    dm = DBCNN(dcfg)
    bc = jax.random.normal(jax.random.PRNGKey(41), (1, 40, 1))
    dparams = dm.init(jax.random.PRNGKey(0), bc, dx, 32)
    dout = dm.apply(dparams, bc, dx, 32)
    assert dout.shape == (1, 32, 40, 1) and bool(jnp.isfinite(dout).all())


# ---------------------------------------------------------------------------
# HPNN-Fast (FLOP-reduced inference model)
# ---------------------------------------------------------------------------

from poisson_cnn_tpu.models import HPNNFast, HPNNFastConfig  # noqa: E402

SMALL_FAST = HPNNFastConfig(
    stem_filters=6,
    stem_kernel_size=5,
    scale_filters=(8, 12, 16),
    scale_kernel_size=3,
    convs_per_scale=1,
    head_filters=6,
    head_kernel_size=5,
    dx_mlp_units=(16, 16),
    dtype=None,
)


def test_hpnn_fast_shapes_and_dirichlet_bc():
    model = HPNNFast(SMALL_FAST)
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), jnp.ones((2, 48, 48, 1)), dx)
    for shape in [(48, 48), (64, 40), (33, 57), (97, 97)]:
        rhs = jax.random.normal(jax.random.PRNGKey(1), (2,) + shape + (1,))
        out = model.apply(params, rhs, dx)
        assert out.shape == rhs.shape, shape
        for sl in (out[:, 0], out[:, -1], out[:, :, 0], out[:, :, -1]):
            np.testing.assert_allclose(np.asarray(sl), 0.0, atol=1e-6)


def test_hpnn_fast_neumann_boundary_mirrors_interior():
    import dataclasses

    cfg = dataclasses.replace(SMALL_FAST, bc_type="neumann")
    model = HPNNFast(cfg)
    rhs = jax.random.normal(jax.random.PRNGKey(1), (1, 48, 48, 1))
    dx = jnp.full((1, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    out = model.apply(params, rhs, dx)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(out[:, 1]), atol=1e-6)


def test_hpnn_fast_gradients_and_dx_sensitivity():
    model = HPNNFast(SMALL_FAST)
    rhs = jax.random.normal(jax.random.PRNGKey(2), (2, 48, 48, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    g = jax.grad(lambda p: jnp.sum(model.apply(p, rhs, dx) ** 2))(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    nonzero = sum(float(jnp.abs(l).max()) > 0 for l in leaves)
    assert nonzero > len(leaves) * 0.5
    # FiLM conditioning must make the output dx-dependent even at zero-init
    # heads after one grad step; check the dx gradient path exists instead
    gdx = jax.grad(lambda d: jnp.sum(model.apply(params, rhs, d) ** 2))(dx)
    assert gdx.shape == dx.shape


def test_hpnn_fast_overfits_tiny_batch():
    model = HPNNFast(SMALL_FAST)
    key = jax.random.PRNGKey(3)
    B, n = 2, 48
    dx = jnp.full((B, 1), 2.0 / (n - 1))
    c = ops.random_series_coefficients(key, B, (3, 3))
    L = ops.compute_domain_sizes(dx, (n, n))
    soln = ops.synthesize_series(c, None, (n, n))[..., None]
    rhs = ops.synthesize_series(
        c * ops.laplacian_eigenvalue_factors(L, (3, 3)), None, (n, n)
    )[..., None]
    rhs, f = ops.set_max_magnitude_in_batch_and_return_scaling_factors(rhs, 1.0)
    soln = soln * f[:, None, None, None]

    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    tx = optax.adam(2e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, rhs, dx)
            return jnp.mean((pred - soln) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses_seq = []
    for _ in range(50):
        params, opt_state, loss = step(params, opt_state)
        losses_seq.append(float(loss))
    assert losses_seq[-1] < 0.5 * losses_seq[0], losses_seq[::10]


def test_hpnn_fast_3d_forward_bc_and_roundtrip():
    """HPNNFast is rank-agnostic (the reference's N-D claim,
    `Homogeneous_Poisson_NN.py:150-188`, on the TPU-first fast family):
    3-D forward shape, exact Dirichlet boundary zeros on all six faces,
    space_to_depth/depth_to_space N-D inverse pair."""
    from poisson_cnn_tpu.models.hpnn_fast import (
        HPNNFast, HPNNFastConfig, space_to_depth, depth_to_space,
    )

    x3 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 12, 4, 3))
    y3 = space_to_depth(x3, 2)
    assert y3.shape == (2, 4, 6, 2, 24)
    assert jnp.allclose(depth_to_space(y3, 2), x3)

    cfg = HPNNFastConfig(
        stem_filters=8, scale_filters=(8, 16), head_filters=8,
        dx_mlp_units=(8,), dtype=None, output_scaling="soln_max_magnitude",
    )
    model = HPNNFast(cfg)
    rhs = jax.random.normal(jax.random.PRNGKey(2), (2, 21, 17, 25, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(3), rhs, dx)
    out = np.asarray(model.apply(params, rhs, dx))
    assert out.shape == rhs.shape
    for axis in (1, 2, 3):
        first = np.take(out, 0, axis=axis)
        last = np.take(out, -1, axis=axis)
        assert np.abs(first).max() == 0.0 and np.abs(last).max() == 0.0, axis


def test_hpnn_fast_flop_reduction():
    """The design contract: >=10x fewer XLA-counted FLOPs than the flagship at
    the same (modest) grid size."""
    n = 64
    rhs = jnp.ones((1, n, n, 1))
    dx = jnp.full((1, 1), 2.0 / (n - 1))

    def flops_of(model):
        params = model.init(jax.random.PRNGKey(0), rhs, dx)
        lowered = jax.jit(lambda p, r, d: model.apply(p, r, d)).lower(params, rhs, dx)
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    fast = flops_of(HPNNFast(HPNNFastConfig(dtype=None)))
    flagship = flops_of(HPNN(HPNNConfig()))
    assert fast > 0 and flagship > 0
    assert flagship / fast >= 10.0, (flagship, fast)


_ND_SMALL = dict(
    pre_filters=(4, 8), pre_kernel_sizes=(5, 3),
    deconv_downsampling_factors=(2,), deconv_kernel_sizes=(2,),
    deconv_conv_kernel_sizes=(3,), resize_downsampling_factors=(4,),
    resize_conv_kernel_sizes=(3,), resize_methods=("bilinear",),
    bottleneck_filters=8, bottleneck_n_convs=1, final_filters=(8, 1),
    final_kernel_sizes=(3, 3), dx_mlp_units=(8,),
)


@pytest.mark.parametrize("shape", [(33,), (17, 17, 17)])
def test_hpnn_nd_forward_bc_and_grad(shape):
    """HPNN is rank-agnostic like the reference's N-D model
    (`Homogeneous_Poisson_NN.py:150-188`): 1-D and 3-D forward, Dirichlet
    border exactly zero, finite gradients, Scaling + Jacobi postsmoother on."""
    from poisson_cnn_tpu.data.reverse_nd import ReverseNDConfig, generate_batch_nd

    nd = len(shape)
    cfg = HPNNConfig(**_ND_SMALL, use_scaling=True, postsmoother_iterations=2)
    model = HPNN(cfg)
    batch = generate_batch_nd(jax.random.PRNGKey(0), ReverseNDConfig(batch_size=2), shape)
    params = model.init(jax.random.PRNGKey(1), batch["rhs"], batch["dx"])
    out = model.apply(params, batch["rhs"], batch["dx"])
    assert out.shape == batch["rhs"].shape
    for ax in range(nd):
        sl = [slice(None)] * (nd + 2)
        sl[1 + ax] = 0
        assert float(jnp.abs(out[tuple(sl)]).max()) == 0.0
        sl[1 + ax] = -1
        assert float(jnp.abs(out[tuple(sl)]).max()) == 0.0
    g = jax.grad(lambda p: jnp.sum(model.apply(p, batch["rhs"], batch["dx"]) ** 2))(params)
    assert all(bool(jnp.isfinite(x).all()) for x in jax.tree_util.tree_leaves(g))


def test_hpnn_3d_overfits_tiny_batch():
    """A few Adam steps on one fixed 3-D batch reduce the loss substantially
    (trainability oracle for the N-D path)."""
    import optax
    from poisson_cnn_tpu.data.reverse_nd import ReverseNDConfig, generate_batch_nd

    cfg = HPNNConfig(**_ND_SMALL, output_scaling="soln_max_magnitude")
    model = HPNN(cfg)
    batch = generate_batch_nd(
        jax.random.PRNGKey(3), ReverseNDConfig(batch_size=2), (17, 17, 17)
    )
    tgt = batch["soln"] / (jnp.abs(batch["soln"]).max(axis=(1, 2, 3, 4), keepdims=True) + 1e-30)
    params = model.init(jax.random.PRNGKey(4), batch["rhs"], batch["dx"])
    tx = optax.adam(3e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        def loss_fn(p):
            pred = model.apply(p, batch["rhs"], batch["dx"])
            return jnp.mean((pred - tgt) ** 2)
        l, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        return optax.apply_updates(p, up), o, l

    losses = []
    for _ in range(40):
        params, opt, l = step(params, opt)
        losses.append(float(l))
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])


def test_hpnn_init_at_max_shape_covers_all_branch_params():
    """HPNN's scale-gated branch pyramid (min(shape) >= 2*ds) means params
    must be created at the LARGEST training shape: init at the range max must
    serve apply at both smaller shapes (extra params unused) and the max
    itself. Guards the train CLI's init-at-range-max policy (train/cli.py)."""
    model = HPNN(SMALL_HPNN)
    # max shape activates the ds=8 resize branch; small shape gates it off
    params = model.init(jax.random.PRNGKey(0), jnp.ones((1, 17, 17, 1)),
                        jnp.full((1, 1), 0.1))
    names = params["params"].keys()
    assert "BottleneckBlock_2" in names  # the ds=8 branch exists
    for shape in ((9, 9), (17, 17), (9, 17)):
        out = model.apply(params, jnp.ones((2,) + shape + (1,)),
                          jnp.full((2, 1), 0.1))
        assert out.shape == (2,) + shape + (1,)


def test_hpnn_fast_r8_fold_odd_grids():
    """The benchmark config folds r=8 spatial blocks into channels before the
    stem (`HPNNFastConfig.input_space_to_depth=8`); grids are padded up to a
    multiple of r * 2^n_scales and cropped back, so odd reference-style sizes
    (65x97) must come back exact-shape with exact Dirichlet boundary zeros."""
    from poisson_cnn_tpu.models.hpnn_fast import (
        HPNNFast, HPNNFastConfig, space_to_depth, depth_to_space,
    )

    x = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 24, 3))
    y = space_to_depth(x, 8)
    assert y.shape == (2, 2, 3, 192)
    assert jnp.allclose(depth_to_space(y, 8), x)

    cfg = HPNNFastConfig(
        input_space_to_depth=8, stem_filters=8, scale_filters=(8, 16),
        head_filters=8, dx_mlp_units=(8,), dtype=None,
        output_scaling="soln_max_magnitude",
    )
    model = HPNNFast(cfg)
    for shape in ((65, 97), (64, 96)):
        rhs = jax.random.normal(jax.random.PRNGKey(5), (2,) + shape + (1,))
        dx = jnp.full((2, 1), 0.02)
        params = model.init(jax.random.PRNGKey(6), rhs, dx)
        out = np.asarray(model.apply(params, rhs, dx))
        assert out.shape == rhs.shape
        for axis in (1, 2):
            assert np.abs(np.take(out, 0, axis=axis)).max() == 0.0
            assert np.abs(np.take(out, -1, axis=axis)).max() == 0.0


# ---------------------------------------------------------------- DBCNNFast

SMALL_DBCNN_FAST = None  # populated lazily (import kept local to the tests)


def _small_dbcnn_fast_cfg():
    from poisson_cnn_tpu.models import DBCNNFastConfig

    return DBCNNFastConfig(
        n_modes=24, input_space_to_depth=2, stem_filters=8, scale_filters=(12,),
        convs_per_scale=1, head_filters=8, cond_mlp_units=(16,),
    )


def test_dbcnn_fast_untrained_equals_discrete_prior():
    """The zero-initialized trunk contributes nothing, so the untrained model
    is the analytic prior — which is discrete-EXACT for a boundary whose DST
    spectrum fits inside n_modes (the series family is band-limited; corner
    values never enter the discrete interior problem). Oracle: the spectral
    Laplace ground truth."""
    from poisson_cnn_tpu.data import GridSamplingConfig
    from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
    from poisson_cnn_tpu.models import DBCNNFast

    cfg = NumericalConfig(
        batch_size=4,
        grids=GridSamplingConfig(((48, 64), (48, 64)), (5e-3, 5e-2)),
        rhs="zero", nonzero_boundaries=("left",), boundary_mode_range=(2, 6),
        magnitude_range=(1.0, 1.0), field_type="series",
    )
    shape = (49, 57)
    batch = generate_numerical_batch(jax.random.PRNGKey(3), cfg, shape)
    model = DBCNNFast(_small_dbcnn_fast_cfg())
    bc = batch["boundaries"]["left"]
    params = model.init(jax.random.PRNGKey(0), bc, batch["dx"], shape[0])
    pred = model.apply(params, bc, batch["dx"], shape[0])
    assert pred.shape == batch["soln"].shape
    rel = np.asarray(
        jnp.linalg.norm((pred - batch["soln"]).reshape(4, -1), axis=1)
        / jnp.linalg.norm(batch["soln"].reshape(4, -1), axis=1)
    )
    assert rel.max() < 1e-3, rel
    # BC row re-imposed exactly
    np.testing.assert_allclose(np.asarray(pred[:, 0]), np.asarray(bc), atol=1e-6)


def test_dbcnn_fast_coarse_noise_prior_reasonable_and_trainable():
    """Coarse-noise boundaries have out-of-band DST content, so the truncated
    prior alone is NOT exact — the residual trunk's job. The prior must still
    be a sane start, and a few SGD steps must reduce the loss."""
    from poisson_cnn_tpu.data import GridSamplingConfig
    from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
    from poisson_cnn_tpu.models import DBCNNFast

    cfg = NumericalConfig(
        batch_size=4,
        grids=GridSamplingConfig(((48, 64), (48, 64)), (5e-3, 5e-2)),
        rhs="zero", nonzero_boundaries=("left",), boundary_mode_range=(2, 6),
        magnitude_range=(1.0, 1.0), field_type="coarse_noise",
    )
    shape = (49, 49)
    batch = generate_numerical_batch(jax.random.PRNGKey(7), cfg, shape)
    model = DBCNNFast(_small_dbcnn_fast_cfg())
    bc = batch["boundaries"]["left"]
    params = model.init(jax.random.PRNGKey(0), bc, batch["dx"], shape[0])
    pred = model.apply(params, bc, batch["dx"], shape[0])
    rel = float(
        jnp.linalg.norm(pred - batch["soln"]) / jnp.linalg.norm(batch["soln"])
    )
    assert rel < 0.7, rel

    tx = optax.adam(1e-4)
    opt = tx.init(params)

    def loss_fn(p):
        out = model.apply(p, bc, batch["dx"], shape[0])
        return jnp.mean((out - batch["soln"]) ** 2)

    l0 = float(loss_fn(params))
    p, o = params, opt
    for _ in range(10):
        loss, g = jax.value_and_grad(loss_fn)(p)
        up, o = tx.update(g, o, p)
        p = optax.apply_updates(p, up)
    assert float(loss_fn(p)) < l0


def test_pcnn_with_fast_components():
    """PCNNConfig.hpnn_fast/dbcnn_fast swap in the fast family; superposition
    output keeps shape and the single-edge BC trace convention."""
    from poisson_cnn_tpu.models import HPNNFastConfig

    cfg = PCNNConfig(
        hpnn_fast=HPNNFastConfig(
            input_space_to_depth=2, stem_filters=8, scale_filters=(12,),
            convs_per_scale=1, head_filters=8, dx_mlp_units=(16,),
        ),
        dbcnn_fast=_small_dbcnn_fast_cfg(),
        hpnn_scale_mode="match_peak_laplacian",
    )
    model = PCNN(cfg)
    B, H, W = 2, 48, 40
    rhs = jax.random.normal(jax.random.PRNGKey(1), (B, H, W, 1))
    dx = jnp.full((B, 1), 0.02)
    left = jax.random.normal(jax.random.PRNGKey(5), (B, W, 1))
    zeros_w = jnp.zeros((B, W, 1))
    zeros_h = jnp.zeros((B, H, 1))
    params = model.init(jax.random.PRNGKey(0), rhs, left, zeros_h, zeros_w, zeros_h, dx)
    out = model.apply(params, rhs, left, zeros_h, zeros_w, zeros_h, dx)
    assert out.shape == rhs.shape
    assert bool(jnp.isfinite(out).all())


def test_pad_to_multiple_guarantees_margin():
    """Exact-multiple grids must still get a zero pad margin: the fold models'
    trunks learn the data->zeros transition as the domain edge (training
    shapes are 32k+1 lattices, so a margin is always present in training);
    marginless multiples measured 62-92% rel-L2 vs 1-9% with the margin
    (checkpoints/even_grid_fix.json)."""
    from poisson_cnn_tpu.models.hpnn_fast import _pad_to_multiple

    x = jnp.ones((1, 96, 64, 1))
    padded, spatial = _pad_to_multiple(x, 32)
    assert spatial == (96, 64)
    assert padded.shape == (1, 128, 96, 1)
    # margin is zeros, data region intact
    np.testing.assert_array_equal(np.asarray(padded[:, 96:, :, :]), 0.0)
    np.testing.assert_array_equal(np.asarray(padded[:, :96, :64, :]), 1.0)
    # non-multiples keep the old behavior
    padded2, _ = _pad_to_multiple(jnp.ones((1, 97, 65, 1)), 32)
    assert padded2.shape == (1, 128, 96, 1)
    # mult=1 is a no-op
    padded3, _ = _pad_to_multiple(jnp.ones((1, 5, 5, 1)), 1)
    assert padded3.shape == (1, 5, 5, 1)


def test_hpnn_fast_forward_on_multiple_sized_grids():
    """Forward pass works and stays finite on exact-multiple grids in 2-D and
    3-D (the previously silently-degraded class)."""
    m = HPNNFast(SMALL_FAST) if "SMALL_FAST" in globals() else None
    import dataclasses as _dc
    from poisson_cnn_tpu.models import HPNNFastConfig

    cfg = HPNNFastConfig(
        input_space_to_depth=2, stem_filters=8, scale_filters=(12,),
        convs_per_scale=1, head_filters=8, dx_mlp_units=(16,),
    )
    model = HPNNFast(cfg)
    rhs = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 96, 1))
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    out = model.apply(params, rhs, dx)
    assert out.shape == rhs.shape and bool(jnp.isfinite(out).all())
    rhs3 = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 16, 1))
    dx3 = jnp.full((1, 3), 0.02)
    p3 = model.init(jax.random.PRNGKey(0), rhs3, dx3)
    out3 = model.apply(p3, rhs3, dx3)
    assert out3.shape == rhs3.shape and bool(jnp.isfinite(out3).all())


def test_pcnn_coarse_anchor_recovers_amplitude():
    """The two-grid amplitude anchor: feeding the PCNN an hpnn whose unit-peak
    output has the exact solution's SHAPE must recover the homogeneous field to
    a few percent (both Laplacian-matching modes underestimate ~25x on real
    CNN outputs — checkpoints/pcnn_fast_eval.json). Oracle built by solving
    the homogeneous problem exactly and checking the anchor's least-squares
    scale against the known amplitude."""
    from poisson_cnn_tpu.ops import peak_magnitudes, resize_align_corners
    from poisson_cnn_tpu.solvers import poisson_solve_dirichlet

    key = jax.random.PRNGKey(0)
    B, H, W = 4, 49, 65
    rhs = jax.random.normal(key, (B, 9, 9, 1))
    rhs = resize_align_corners(rhs, (H, W), "bicubic")  # smooth random rhs
    dx = jnp.full((B, 2), 0.02)
    u_exact = poisson_solve_dirichlet(rhs, dx, mode="fd")
    peaks = peak_magnitudes(u_exact).reshape(B, 1, 1, 1)
    u_raw = u_exact / peaks  # unit-peak 'CNN output' with perfect shape
    rhs_peak = peak_magnitudes(rhs)
    rhs_n = rhs / rhs_peak.reshape(B, 1, 1, 1)

    nc = 17
    rhs_c = resize_align_corners(rhs_n, (nc, nc), "bilinear")
    dx_c = dx * (jnp.array([H - 1, W - 1], dtype=dx.dtype) / (nc - 1))
    u_c = poisson_solve_dirichlet(rhs_c, dx_c, mode="fd")
    ur_c = resize_align_corners(u_raw, (nc, nc), "bilinear")
    num = jnp.sum((ur_c * u_c).reshape(B, -1), axis=1)
    den = jnp.sum((ur_c * ur_c).reshape(B, -1), axis=1) + 1e-30
    scale = (num / den) * rhs_peak
    rel = np.asarray(jnp.abs(scale.reshape(B, 1, 1, 1) * u_raw - u_exact).max()
                     / peaks.max())
    np.testing.assert_allclose(
        np.asarray(scale), np.asarray(peaks[:, 0, 0, 0]), rtol=0.05
    )


def test_pad_to_multiple_marginless_optout():
    """force_margin=False (jitter-trained checkpoints only) runs exact
    multiples unpadded; non-multiples are unchanged."""
    from poisson_cnn_tpu.models.hpnn_fast import _pad_to_multiple

    p, sp = _pad_to_multiple(jnp.ones((1, 96, 64, 1)), 32, force_margin=False)
    assert p.shape == (1, 96, 64, 1) and sp == (96, 64)
    p2, _ = _pad_to_multiple(jnp.ones((1, 97, 65, 1)), 32, force_margin=False)
    assert p2.shape == (1, 128, 96, 1)
