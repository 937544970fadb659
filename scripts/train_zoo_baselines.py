"""Short training runs for the baseline/zoo models (round-3 VERDICT #4/#7):
UNet, FourierAutoencoderHPNN, MetaHPNN, DBCRNN, MetaDBCNN.

The reference ships train scripts + configs for UNet and the boundary RNN
(`poisson_CNN/train/UNet.py:29-57`, `train/dbcnn_rnn_train.py:26-50`) and a
metalearning/autoencoder model-type dispatch (`train/hpnn_train.py:24-30`);
capability parity therefore includes demonstrating each baseline actually
TRAINS to a non-absurd rel-L2, not just passing unit tests. Each run here is a
few-k-step demo at small grids (65-129), not a tuned artifact; rows land in
PARITY.md next to the flagship artifacts.

Writes checkpoints/zoo/<name>/{step_*, eval.json}.

Usage: python scripts/train_zoo_baselines.py [--models unet,fourier_ae,...]
       [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np
import optax

from poisson_cnn_tpu import losses
from poisson_cnn_tpu.data import (
    GridSamplingConfig,
    Normalizations,
    ReverseConfig,
    generate_batch,
    sample_grid_shape,
)
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.evaluation import evaluate_hpnn, evaluate_hpnn_coarse_noise
from poisson_cnn_tpu.models import (
    DBCRNN,
    DBCRNNConfig,
    FourierAutoencoderHPNN,
    FourierAutoencoderConfig,
    MetaDBCNN,
    MetaDBCNNConfig,
    MetaHPNN,
    MetaHPNNConfig,
    UNet,
    UNetConfig,
)
from poisson_cnn_tpu.train.loop import save_checkpoint

GRIDS = GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32)
REVERSE = ReverseConfig(
    batch_size=16,
    grids=GRIDS,
    fourier_mode_range=(1, 6),
    taylor_degree_range=(2, 5),
    bc="dirichlet",
    normalizations=Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True),
)
BOUNDARY = NumericalConfig(
    batch_size=16,
    grids=GRIDS,
    rhs="zero",
    nonzero_boundaries=("left",),
    boundary_mode_range=(2, 6),
    magnitude_range=(1.0, 1.0),
)
LOSS = losses.LossConfig(
    mse_weight=1.0, mae_weight=0.2, integral_weight=0.0, global_batch_size=16
)
EVAL_SHAPES = ((97, 97), (65, 129))


def _rhs_model_factories():
    """(rhs, dx) -> soln models (HPNN task wiring)."""
    return {
        "unet": lambda: UNet(UNetConfig()),
        "fourier_ae": lambda: FourierAutoencoderHPNN(FourierAutoencoderConfig()),
        "meta_hpnn": lambda: MetaHPNN(MetaHPNNConfig()),
    }


def train_rhs_model(name, model, steps, lr, out_dir):
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 129, 129, 1)), jnp.full((1, 1), 0.01)
        )
    params = jax.device_put(params, jax.devices()[0])
    warmup = min(100, max(1, steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps + warmup, lr * 0.05)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])
    cache = {}

    def make_step(shape):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_batch(key, REVERSE, shape)
                pred = model.apply(p, batch["rhs"], batch["dx"])
                return losses.loss_wrapper(
                    LOSS, batch["soln"], pred, batch["rhs"], batch["dx"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    running = []
    for it in range(steps):
        shape = sample_grid_shape(rng, GRIDS)
        if shape not in cache:
            print(f"[{name} {it}] compiling {shape}", flush=True)
            cache[shape] = make_step(shape)
        key, sub = jax.random.split(key)
        params, opt_state, loss = cache[shape](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 250 == 0:
            print(
                f"{name} step {it+1}: loss={np.mean(running[-250:]):.5f} "
                f"({(it+1)/(time.time()-t0):.2f} steps/s)",
                flush=True,
            )
            if not np.isfinite(running[-1]):
                raise FloatingPointError(f"{name}: loss diverged")

    apply_fn = jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))
    metrics = {
        "in_family": evaluate_hpnn(apply_fn, REVERSE, grid_shapes=EVAL_SHAPES),
        "coarse_noise": evaluate_hpnn_coarse_noise(apply_fn, grid_shapes=EVAL_SHAPES),
        "final_train_loss": float(np.mean(running[-250:])),
        "steps": steps,
    }
    metrics["checkpoint"] = save_checkpoint(out_dir, params, steps)
    return metrics


def train_boundary_model(name, model, steps, lr, out_dir, meta=False):
    """(bc, dx, x_res) -> field models (DBCNN task wiring): zero RHS, one
    nonzero boundary, spectral Laplace ground truth."""
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97
        )
    params = jax.device_put(params, jax.devices()[0])
    warmup = min(100, max(1, steps // 10))
    schedule = optax.warmup_cosine_decay_schedule(0.0, lr, warmup, steps + warmup, lr * 0.05)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])
    cache = {}

    def make_step(shape):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_numerical_batch(key, BOUNDARY, shape)
                pred = model.apply(
                    p, batch["boundaries"]["left"], batch["dx"], shape[0]
                )
                return losses.loss_wrapper(
                    LOSS, batch["soln"], pred, batch["rhs"], batch["dx"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    running = []
    for it in range(steps):
        shape = sample_grid_shape(rng, GRIDS)
        if shape not in cache:
            print(f"[{name} {it}] compiling {shape}", flush=True)
            cache[shape] = make_step(shape)
        key, sub = jax.random.split(key)
        params, opt_state, loss = cache[shape](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 250 == 0:
            print(
                f"{name} step {it+1}: loss={np.mean(running[-250:]):.5f} "
                f"({(it+1)/(time.time()-t0):.2f} steps/s)",
                flush=True,
            )
            if not np.isfinite(running[-1]):
                raise FloatingPointError(f"{name}: loss diverged")

    errs = []
    for i in range(4):
        shape = EVAL_SHAPES[i % 2]
        batch = generate_numerical_batch(jax.random.PRNGKey(20_000 + i), BOUNDARY, shape)
        pred = model.apply(params, batch["boundaries"]["left"], batch["dx"], shape[0])
        d = (pred - batch["soln"]).reshape(pred.shape[0], -1)
        s = batch["soln"].reshape(pred.shape[0], -1)
        errs.append(np.asarray(jnp.linalg.norm(d, axis=1) / jnp.linalg.norm(s, axis=1)))
    e = np.concatenate(errs)
    metrics = {
        "in_family": {
            "rel_l2_mean": float(e.mean()),
            "rel_l2_median": float(np.median(e)),
            "rel_l2_p90": float(np.percentile(e, 90)),
            "n": int(e.size),
        },
        "final_train_loss": float(np.mean(running[-250:])),
        "steps": steps,
    }
    metrics["checkpoint"] = save_checkpoint(out_dir, params, steps)
    return metrics


def main():
    p = argparse.ArgumentParser()
    p.add_argument(
        "--models", default="unet,fourier_ae,meta_hpnn,dbcrnn,meta_dbcnn"
    )
    p.add_argument("--steps", type=int, default=2500)
    p.add_argument("--lr", type=float, default=2e-4)
    args = p.parse_args()

    results = {}
    for name in args.models.split(","):
        out_dir = f"/root/repo/checkpoints/zoo/{name}"
        os.makedirs(out_dir, exist_ok=True)
        print(f"=== training {name} ===", flush=True)
        if name in _rhs_model_factories():
            model = _rhs_model_factories()[name]()
            metrics = train_rhs_model(name, model, args.steps, args.lr, out_dir)
        elif name == "dbcrnn":
            model = DBCRNN(DBCRNNConfig())
            metrics = train_boundary_model(name, model, args.steps, args.lr, out_dir)
        elif name == "meta_dbcnn":
            model = MetaDBCNN(MetaDBCNNConfig())
            metrics = train_boundary_model(name, model, args.steps, args.lr, out_dir)
        else:
            raise ValueError(name)
        # record the exact model config next to the checkpoint (zoo defaults
        # evolve across rounds; eval rows must stay reproducible)
        import dataclasses as _dc
        with open(os.path.join(out_dir, "config.json"), "w") as f:
            json.dump(_dc.asdict(model.cfg), f, indent=2, default=str)
        with open(os.path.join(out_dir, "eval.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        results[name] = metrics
        print(json.dumps({name: metrics}, indent=2), flush=True)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
