"""Training-subsystem tests: config parsing, the CLI end-to-end on tiny
configs (loss decreases), checkpoint save/restore round trip, DP mesh step,
numerical data mode, LR plateau mechanics."""

import dataclasses
import json
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from poisson_cnn_tpu import ops
from poisson_cnn_tpu.data import GridSamplingConfig
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.train import load_experiment
from poisson_cnn_tpu.train.loop import restore_checkpoint, save_checkpoint


TINY_HPNN_EXPERIMENT = {
    "model": {
        "type": "hpnn",
        "pre_filters": [4, 8],
        "pre_kernel_sizes": [7, 5],
        "deconv_downsampling_factors": [2, 4],
        "deconv_kernel_sizes": [2, 4],
        "deconv_conv_kernel_sizes": [5, 3],
        "resize_downsampling_factors": [8],
        "resize_conv_kernel_sizes": [3],
        "resize_methods": ["bilinear"],
        "bottleneck_filters": 8,
        "bottleneck_n_convs": 1,
        "final_filters": [8, 4, 1],
        "final_kernel_sizes": [5, 3, 3],
        "dx_mlp_units": [16, 16],
    },
    "dataset": {
        "type": "reverse",
        "batch_size": 4,
        "grids": {
            "shape_range": [[32, 48], [32, 48]],
            "dx_range": [0.01, 0.05],
            "snap": 16,
        },
        "fourier_mode_range": [1, 4],
        "taylor_degree_range": [2, 4],
        "normalizations": {"rhs_max_magnitude": 1.0},
    },
    "training": {
        "n_epochs": 3,
        "steps_per_epoch": 8,
        "learning_rate": 1e-3,
        "loss": {"mse_weight": 1.0, "mae_weight": 0.0, "integral_weight": 0.0},
    },
}


def _write_cfg(tmp_path, payload):
    path = os.path.join(tmp_path, "cfg.json")
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def test_load_experiment_roundtrip(tmp_path):
    path = _write_cfg(str(tmp_path), TINY_HPNN_EXPERIMENT)
    model_cfg, data_cfg, train_cfg = load_experiment(path)
    assert model_cfg.pre_filters == (4, 8)
    assert data_cfg.grids.snap == 16
    assert train_cfg.loss.mse_weight == 1.0
    # configs must be hashable (static jit args)
    hash(model_cfg), hash(data_cfg)


def test_load_experiment_rejects_unknown_fields(tmp_path):
    bad = json.loads(json.dumps(TINY_HPNN_EXPERIMENT))
    bad["model"]["no_such_field"] = 1
    path = _write_cfg(str(tmp_path), bad)
    with pytest.raises(ValueError, match="no_such_field"):
        load_experiment(path)


def test_hpnn_cli_end_to_end(tmp_path):
    """Full CLI path on a tiny config: training runs, loss decreases, best
    checkpoint is written."""
    from poisson_cnn_tpu.train.hpnn_train import main

    cfg_path = _write_cfg(str(tmp_path), TINY_HPNN_EXPERIMENT)
    ckpt_dir = os.path.join(str(tmp_path), "ckpt")
    trainer, state = main([cfg_path, "--checkpoint_dir", ckpt_dir])
    assert trainer.history[-1] < trainer.history[0]
    assert os.path.isdir(ckpt_dir) and len(os.listdir(ckpt_dir)) >= 1


def test_checkpoint_roundtrip_and_dtype_cast(tmp_path):
    params = {"w": jnp.arange(4.0), "b": jnp.zeros((2,))}
    path = save_checkpoint(str(tmp_path / "ck"), params, 7)
    like = {"w": jnp.zeros(4, jnp.bfloat16), "b": jnp.zeros((2,), jnp.bfloat16)}
    restored, step = restore_checkpoint(path, like)
    assert step == 7
    assert restored["w"].dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(restored["w"], np.float32), [0, 1, 2, 3])


def test_numerical_batch_ground_truth_satisfies_bcs():
    cfg = NumericalConfig(
        batch_size=3,
        grids=GridSamplingConfig(((32, 48), (32, 48)), (0.01, 0.05)),
        rhs="zero",
        nonzero_boundaries=("left",),
        # series fields vanish at edge endpoints, so the whole border row
        # (corners included) can be compared exactly; the coarse_noise default
        # has the reference's corner ambiguity (adjacent edges disagree)
        field_type="series",
    )
    batch = generate_numerical_batch(jax.random.PRNGKey(0), cfg, (40, 32))
    soln, b = batch["soln"], batch["boundaries"]
    np.testing.assert_allclose(
        np.asarray(soln[:, 0, :, :]), np.asarray(b["left"]), atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(soln[:, -1, :, :]), 0.0, atol=1e-5)
    # interior satisfies laplace eq: residual small relative to field scale
    lap = ops.apply_fd_operator(soln, batch["dx"], 3, 2)
    assert float(jnp.abs(lap).max()) < 1e-2 * float(
        jnp.abs(batch["dx"]).min() ** -2
    )


def test_numerical_batch_full_bcs_and_rhs():
    cfg = NumericalConfig(
        batch_size=2,
        grids=GridSamplingConfig(((32, 48), (32, 48)), (0.01, 0.05)),
        rhs="random",
        nonzero_boundaries=("left", "right", "top", "bottom"),
    )
    batch = generate_numerical_batch(jax.random.PRNGKey(1), cfg, (32, 32))
    soln, b = batch["soln"], batch["boundaries"]
    for name, sl in [
        ("left", soln[:, 0, :, :]),
        ("right", soln[:, -1, :, :]),
        ("top", soln[:, :, 0, :]),
        ("bottom", soln[:, :, -1, :]),
    ]:
        got = np.asarray(sl)
        want = np.asarray(b[name])
        # corners belong to two edges; compare away from corners
        np.testing.assert_allclose(got[:, 2:-2], want[:, 2:-2], atol=1e-4)


def test_lr_plateau_mechanics(tmp_path):
    from poisson_cnn_tpu.train.loop import Trainer, _get_lr
    from poisson_cnn_tpu.train.config import TrainingConfig
    import optax

    cfg = TrainingConfig(n_epochs=1, steps_per_epoch=1, learning_rate=1e-3,
                         reduce_lr_patience=0, reduce_lr_factor=0.1)

    params = {"w": jnp.ones(3)}

    def make_step(shape, tx):
        def step(state, key):
            grads = {"w": jnp.ones(3)}
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            new_params = optax.apply_updates(state.params, updates)
            return state.replace(step=state.step + 1, params=new_params,
                                 opt_state=opt_state), {"loss": jnp.asarray(1.0)}
        return step

    tr = Trainer(params, lambda: (8, 8), make_step, cfg)
    assert tr.current_learning_rate() == pytest.approx(1e-3)
    tr.set_learning_rate(5e-4)
    assert tr.current_learning_rate() == pytest.approx(5e-4)


def test_trainer_no_per_step_host_sync():
    """The hot loop must not fetch the loss to host every step (that would
    serialize dispatch against device execution): with log_every > steps, no
    step's loss may be materialized before the last step has been dispatched."""
    from poisson_cnn_tpu.train.loop import Trainer
    from poisson_cnn_tpu.train.config import TrainingConfig

    n_steps = 10
    tracker = {"dispatched": 0, "fetches": []}

    class SpyLoss:
        def __init__(self, i):
            self.i = i

        def __float__(self):
            tracker["fetches"].append((self.i, tracker["dispatched"]))
            return 0.5

    def make_step(shape, tx):
        def step(state, key):
            tracker["dispatched"] += 1
            return (
                state.replace(step=state.step + 1),
                {"loss": SpyLoss(tracker["dispatched"] - 1)},
            )

        return step

    cfg = TrainingConfig(n_epochs=1, steps_per_epoch=n_steps, learning_rate=1e-3)
    tr = Trainer({"w": jnp.ones(3)}, lambda: (8, 8), make_step, cfg,
                 log_every=1000)
    tr.run()
    assert tracker["fetches"], "loss never checked at all"
    for i, dispatched_at_fetch in tracker["fetches"]:
        assert dispatched_at_fetch == n_steps, (
            f"loss of step {i} fetched after only {dispatched_at_fetch} "
            f"dispatched steps — per-step host sync is back"
        )


def test_set_lr_functional_rebuild():
    """_set_lr must return a rebuilt state (no in-place dict mutation): it has
    to survive tree_map reconstruction and must not alias the input state."""
    import optax
    from poisson_cnn_tpu.train.config import TrainingConfig
    from poisson_cnn_tpu.train.loop import make_optimizer, _get_lr, _set_lr

    cfg = TrainingConfig(learning_rate=1e-3, grad_clip_norm=1.0)
    tx = make_optimizer(cfg)
    params = {"w": jnp.ones(4)}
    s1 = tx.init(params)
    # reconstruct every container the way jit donation / device_put does
    s1 = jax.tree_util.tree_map(lambda x: x, s1)
    s2 = _set_lr(s1, 5e-4)
    assert float(_get_lr(s2)) == pytest.approx(5e-4)
    assert float(_get_lr(s1)) == pytest.approx(1e-3), "input state was mutated"
    # the new lr must actually drive updates: lr=0 -> zero update
    s0 = _set_lr(s1, 0.0)
    updates, _ = tx.update({"w": jnp.ones(4)}, s0, params)
    assert float(jnp.abs(updates["w"]).max()) == 0.0


def test_bf16_mixed_precision_training():
    """bf16 compute dtype: params stay fp32, forward/backward finite, loss
    decreases on a fixed batch (BASELINE config 4 capability)."""
    import optax
    from poisson_cnn_tpu.models import HPNN, HPNNConfig

    cfg = HPNNConfig(
        pre_filters=(4, 8), pre_kernel_sizes=(7, 5),
        deconv_downsampling_factors=(2,), deconv_kernel_sizes=(2,),
        deconv_conv_kernel_sizes=(3,), resize_downsampling_factors=(),
        resize_conv_kernel_sizes=(), resize_methods=(),
        bottleneck_filters=8, bottleneck_n_convs=1,
        final_filters=(4, 1), final_kernel_sizes=(3, 3), dx_mlp_units=(8,),
        dtype="bfloat16",
    )
    model = HPNN(cfg)
    key = jax.random.PRNGKey(0)
    rhs = jax.random.normal(key, (2, 32, 32, 1))
    soln = 0.1 * rhs
    dx = jnp.full((2, 1), 0.02)
    params = model.init(jax.random.PRNGKey(1), rhs, dx)
    # params stay fp32 (master weights); compute is bf16
    assert all(
        l.dtype == jnp.float32 for l in jax.tree_util.tree_leaves(params)
    )
    out = model.apply(params, rhs, dx)
    assert out.dtype == jnp.float32  # cast back at the boundary

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    @jax.jit
    def step(p, o):
        l, g = jax.value_and_grad(
            lambda p: jnp.mean((model.apply(p, rhs, dx) - soln) ** 2)
        )(p)
        u, o = tx.update(g, o)
        return optax.apply_updates(p, u), o, l

    l0 = None
    for _ in range(30):
        params, opt, l = step(params, opt)
        if l0 is None:
            l0 = float(l)
    assert float(l) < 0.7 * l0 and jnp.isfinite(l)


def test_spatial_sharded_jacobi_matches_single_device():
    """shard_map halo-exchange smoother == single-device smoother on an
    8-device mesh (spatial domain decomposition for huge grids)."""
    from poisson_cnn_tpu.parallel import create_mesh
    from poisson_cnn_tpu.parallel.spatial import jacobi_smooth_spatial
    from poisson_cnn_tpu.solvers import jacobi_smooth

    mesh = create_mesh(8)
    key = jax.random.PRNGKey(12)
    u = jnp.zeros((2, 64, 32, 1))
    rhs = jax.random.normal(key, (2, 64, 32, 1))
    dx = jnp.array([[0.1, 0.2], [0.07, 0.05]])
    want = jacobi_smooth(u, rhs, dx, 12)
    got = jacobi_smooth_spatial(mesh, u, rhs, dx, 12)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_spatial_cg_full_solve_matches_single_device():
    """shard_map halo-exchange CG == single-device CG: a FULL Poisson solve
    spatially decomposed over an 8-device mesh (not just the smoother)."""
    from poisson_cnn_tpu.parallel import create_mesh, conjugate_gradient_spatial
    from poisson_cnn_tpu.solvers import conjugate_gradient
    from poisson_cnn_tpu.solvers.iterative import laplacian_dirichlet

    mesh = create_mesh(8)
    # FD-exact truth: rhs = lap(u_true) for a sine eigenfunction
    n0, n1 = 64, 33
    xs = jnp.linspace(0, 1, n0)
    ys = jnp.linspace(0, 1, n1)
    X, Y = jnp.meshgrid(xs, ys, indexing="ij")
    u_true = (jnp.sin(jnp.pi * X) * jnp.sin(2 * jnp.pi * Y))[None, :, :, None]
    u_true = jnp.concatenate([u_true, 0.5 * u_true], axis=0)
    dx = jnp.array([[1.0 / (n0 - 1), 1.0 / (n1 - 1)]] * 2)
    rhs = laplacian_dirichlet(u_true, dx)
    want = conjugate_gradient(rhs, dx, n_iterations=80)
    got = conjugate_gradient_spatial(mesh, rhs, dx, n_iterations=80)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # and both actually solve the problem
    rel = float(
        jnp.linalg.norm(got - u_true) / jnp.linalg.norm(u_true)
    )
    assert rel < 1e-3, rel


def test_spatial_sharded_model_forward_matches_single_device():
    """HPNNFast forward with activations sharded along H over the 8-device
    mesh (GSPMD: XLA inserts conv halo exchanges + collective reductions)
    must equal the single-device forward, and the per-device activation
    working set must shrink vs one device."""
    from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig
    from poisson_cnn_tpu.parallel import create_mesh, spatial_sharded_forward

    mesh = create_mesh(8)
    cfg = HPNNFastConfig(
        stem_filters=8, scale_filters=(8, 16), head_filters=8,
        dx_mlp_units=(8,), dtype=None, output_scaling="soln_max_magnitude",
    )
    model = HPNNFast(cfg)
    rhs = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 64, 1))
    dx = jnp.full((2, 2), 0.01)
    params = model.init(jax.random.PRNGKey(1), rhs, dx)

    def apply_fn(p, r, d):
        return model.apply(p, r, d)

    want = jax.jit(apply_fn)(params, rhs, dx)
    got, compiled = spatial_sharded_forward(mesh, apply_fn, params, rhs, dx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)
    # sharded output really is distributed along H
    shard_shapes = {s.data.shape for s in got.addressable_shards}
    assert shard_shapes == {(2, 128 // 8, 64, 1)}, shard_shapes


def test_spatial_sharded_train_step_matches_single_device():
    """One full training step (forward + backward + adam update) with
    activations AND gradients spatially sharded along H over the 8-device mesh
    must produce the same loss and updated params as the single-device step."""
    import optax

    from poisson_cnn_tpu import losses
    from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig
    from poisson_cnn_tpu.parallel import create_mesh, make_spatial_train_step

    mesh = create_mesh(8)
    cfg = HPNNFastConfig(
        stem_filters=8, scale_filters=(8, 16), head_filters=8,
        dx_mlp_units=(8,), dtype=None, output_scaling="soln_max_magnitude",
    )
    model = HPNNFast(cfg)
    rhs = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 64, 1))
    soln = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 64, 1))
    dx = jnp.full((2, 2), 0.01)
    params = model.init(jax.random.PRNGKey(2), rhs, dx)

    loss_cfg = losses.LossConfig(mse_weight=1.0, mae_weight=0.2, global_batch_size=2)

    def apply_fn(p, r, d):
        return model.apply(p, r, d)

    def loss_fn(s, pred, r, d):
        return losses.loss_wrapper(loss_cfg, s, pred, r, d)

    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    step_sp = make_spatial_train_step(mesh, apply_fn, loss_fn, tx)
    p_sp, _, loss_sp = step_sp(params, opt_state, rhs, soln, dx)

    def step_single(p0, o0):
        def lf(p):
            return loss_fn(soln, apply_fn(p, rhs, dx), rhs, dx)

        loss, grads = jax.value_and_grad(lf)(p0)
        updates, o1 = tx.update(grads, o0, p0)
        return optax.apply_updates(p0, updates), o1, loss

    p_1, _, loss_1 = jax.jit(step_single)(params, opt_state)
    assert abs(float(loss_sp) - float(loss_1)) < 1e-5
    for a, b in zip(
        jax.tree_util.tree_leaves(p_sp), jax.tree_util.tree_leaves(p_1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_gradient_accumulation_equivalence():
    """accumulation_steps=2 must average gradients over two generated
    microbatches (reference grad-accumulation capability)."""
    import optax
    from poisson_cnn_tpu.parallel import TrainState, make_generating_train_step

    params = {"w": jnp.ones((3,))}

    def generate_fn(key):
        return {"x": jax.random.normal(key, (4, 3))}

    def loss_fn(p, batch):
        return jnp.mean((batch["x"] @ p["w"]) ** 2)

    tx = optax.sgd(1e-2)
    state = TrainState(step=jnp.zeros((), jnp.int32), params=params,
                       opt_state=tx.init(params))
    step_acc = make_generating_train_step(generate_fn, loss_fn, tx,
                                          accumulation_steps=2, donate=False)
    key = jax.random.PRNGKey(0)
    _, metrics = step_acc(state, key)
    # manual average over the two microbatch keys
    keys = jax.random.split(key, 2)
    g1 = jax.grad(loss_fn)(params, generate_fn(keys[0]))
    g2 = jax.grad(loss_fn)(params, generate_fn(keys[1]))
    want_norm = float(optax.global_norm(jax.tree_util.tree_map(
        lambda a, b: (a + b) / 2, g1, g2)))
    assert float(metrics["grad_norm"]) == pytest.approx(want_norm, rel=1e-5)


def test_weighted_contraction_layer():
    from poisson_cnn_tpu.layers import WeightedContraction

    m = WeightedContraction("bijc,c->bij", (3,), apply_softmax=True)
    x = jnp.ones((2, 4, 4, 3))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 4, 4)
    np.testing.assert_allclose(np.asarray(out), 1.0, rtol=1e-5)  # softmax sums to 1


def test_numerical_solver_selection():
    """All three ground-truth solver backends produce consistent solutions."""
    import dataclasses
    base = NumericalConfig(
        batch_size=2,
        grids=GridSamplingConfig(((33, 33), (33, 33)), (0.01, 0.05)),
        rhs="random", nonzero_boundaries=("left",),
    )
    results = {}
    for solver in ("spectral", "multigrid", "cholesky"):
        cfg = dataclasses.replace(base, solver=solver)
        batch = generate_numerical_batch(jax.random.PRNGKey(3), cfg, (33, 33))
        results[solver] = np.asarray(batch["soln"])
    for other in ("multigrid", "cholesky"):
        rel = np.linalg.norm(results[other] - results["spectral"]) / np.linalg.norm(
            results["spectral"]
        )
        assert rel < 1e-3, (other, rel)


def test_evaluation_module_solver_floor():
    """The FD spectral solver hits near-zero rel-L2 on un-normalized reverse
    data — the evaluation harness' sanity anchor."""
    from poisson_cnn_tpu import evaluation, solvers
    from poisson_cnn_tpu.data import Normalizations, ReverseConfig

    cfg = ReverseConfig(
        batch_size=4,
        grids=GridSamplingConfig(((48, 64), (48, 64)), (0.01, 0.05)),
        fourier_mode_range=(1, 4),
        taylor_degree_range=(2, 4),
        normalizations=Normalizations(),  # no normalization
    )
    out = evaluation.solver_baseline(
        lambda rhs, dx: solvers.poisson_solve_dirichlet(rhs, dx, mode="fd"),
        cfg, grid_shapes=((49, 49),), n_batches=2,
    )
    assert out["rel_l2_mean"] < 5e-2, out  # FD truncation floor
    # an untrained "model" (zero predictor) must score rel_l2 = 1
    out0 = evaluation.evaluate_hpnn(
        lambda rhs, dx: jnp.zeros_like(rhs), cfg, grid_shapes=((49, 49),),
        n_batches=1,
    )
    assert out0["rel_l2_mean"] == pytest.approx(1.0, rel=1e-5)


def test_all_shipped_experiment_configs_parse():
    import glob
    from poisson_cnn_tpu.train import load_experiment

    paths = sorted(glob.glob("experiments/*.json"))
    assert len(paths) >= 9, paths
    for path in paths:
        model_cfg, data_cfg, train_cfg = load_experiment(path)
        hash(model_cfg), hash(data_cfg)  # static-arg hashability


def test_hpnn_train_model_type_dispatch(tmp_path):
    """hpnn_train dispatches by config type (reference model_type selection)."""
    exp = json.loads(json.dumps(TINY_HPNN_EXPERIMENT))
    exp["model"] = {
        "type": "meta_hpnn",
        "pre_filters": [4], "pre_kernel_sizes": [5],
        "bottleneck_downsampling_factors": [2],
        "bottleneck_conv_kernel_sizes": [3],
        "bottleneck_deconv_kernel_sizes": [2],
        "bottleneck_upsample_modes": ["deconv"],
        "bottleneck_filters": 8, "bottleneck_n_convs": 1,
        "final_filters": [8, 1], "final_kernel_sizes": [3, 3],
        "hidden_units": [8, 8],
    }
    exp["training"]["n_epochs"] = 1
    exp["training"]["steps_per_epoch"] = 2
    path = _write_cfg(str(tmp_path), exp)
    from poisson_cnn_tpu.train.hpnn_train import main

    trainer, state = main([path])
    assert np.isfinite(trainer.history[-1])


def test_make_eval_step_dp_inference():
    from poisson_cnn_tpu.parallel import create_mesh, make_eval_step
    from poisson_cnn_tpu.models import UNet, UNetConfig

    mesh = create_mesh(8)
    model = UNet(UNetConfig(depth=2, root_features=4))
    rhs = jnp.ones((16, 32, 32, 1))
    dx = jnp.full((16, 1), 0.02)
    params = model.init(jax.random.PRNGKey(0), rhs, dx)
    step = make_eval_step(lambda p, r, d: model.apply(p, r, d), mesh)
    out = step(params, rhs, dx)
    assert out.shape == rhs.shape and bool(jnp.isfinite(out).all())


def test_make_optimizer_adamw_and_clip():
    """optimizer='adamw' + grad_clip_norm: the drift-study fix is available
    through the production config (decoupled decay anchors Adam's param-norm
    walk along output-normalization flat directions)."""
    from poisson_cnn_tpu.train.config import TrainingConfig
    from poisson_cnn_tpu.train.loop import make_optimizer, _get_lr, _set_lr

    cfg = TrainingConfig(optimizer="adamw", weight_decay=1e-4,
                         grad_clip_norm=1.0, learning_rate=1e-3)
    tx = make_optimizer(cfg)
    p = {"w": jnp.ones((3,))}
    s = tx.init(p)
    up, s2 = tx.update({"w": jnp.full((3,), 100.0)}, s, p)
    # clipped + adam-normalized + decayed update stays bounded
    assert float(jnp.abs(up["w"]).max()) < 2e-3
    assert float(_get_lr(s2)) == pytest.approx(1e-3)
    s3 = _set_lr(s2, 5e-4)
    assert float(_get_lr(s3)) == pytest.approx(5e-4)


def test_trainer_adam_sgd_two_phase_switch():
    """optimizer='adam-sgd': the Trainer swaps to the momentum-SGD tail at
    sgd_tail_at * n_epochs (the drift study's fix — Adam finds the basin,
    gradient-proportional SGD holds it), re-initializing opt_state and the
    compiled-step cache while keeping params."""
    import optax
    from poisson_cnn_tpu.train.config import TrainingConfig
    from poisson_cnn_tpu.train.loop import Trainer

    cfg = TrainingConfig(n_epochs=4, steps_per_epoch=2, optimizer="adam-sgd",
                         learning_rate=1e-3, sgd_tail_at=0.5,
                         sgd_tail_lr_mult=10.0, grad_clip_norm=1.0)
    params = {"w": jnp.ones(3)}
    seen_tx = []

    def make_step(shape, tx):
        seen_tx.append(tx)

        def step(state, key):
            grads = {"w": jnp.full(3, 0.1)}
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            return state.replace(
                step=state.step + 1,
                params=optax.apply_updates(state.params, updates),
                opt_state=opt_state,
            ), {"loss": jnp.asarray(1.0)}

        return step

    tr = Trainer(params, lambda: (8, 8), make_step, cfg)
    tr.run()
    # one step fn compiled per phase (same shape, tx swap clears the cache)
    assert len(seen_tx) == 2 and seen_tx[0] is not seen_tx[1]
    # SGD-tail lr = learning_rate * sgd_tail_lr_mult
    assert tr.current_learning_rate() == pytest.approx(1e-2)


def test_two_phase_adam_sgd_fused_single_executable():
    """two_phase_adam_sgd selects the phase by a traced counter, so one
    jitted step covers both phases (no recompile at the switch): warmup
    ramp under Adam, then gradient-proportional momentum-SGD updates."""
    import optax
    from poisson_cnn_tpu.train.loop import two_phase_adam_sgd

    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     two_phase_adam_sgd(1e-3, 300, 1000))
    p = {"w": jnp.ones(4)}
    s = tx.init(p)
    s[1]["t"] = jnp.asarray(298, jnp.int32)  # two steps before the switch
    g = {"w": jnp.full(4, 0.01)}

    @jax.jit
    def step(p, s):
        up, s2 = tx.update(g, s, p)
        return optax.apply_updates(p, up), s2, up

    mags = []
    for _ in range(4):
        p, s, up = step(p, s)
        mags.append(float(jnp.abs(up["w"]).max()))
    # adam phase: schedule count starts at 0 -> warmup lr 0, then ramps
    assert mags[0] == 0.0 and 0.0 < mags[1] < 1e-4
    # sgd tail first step: lr_tail * g = 1e-2 * 0.01 = 1e-4 exactly
    assert mags[2] == pytest.approx(1e-4, rel=0.05)
    # momentum accumulates
    assert mags[3] > mags[2]
