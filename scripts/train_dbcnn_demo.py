"""Train a mid-size DBCNN on numerical-mode data (zero RHS, one boundary) and
evaluate relative-L2 vs the spectral Laplace ground truth.

Companion to scripts/train_hpnn_demo.py; writes checkpoints/dbcnn_demo/.
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
from poisson_cnn_tpu.data import GridSamplingConfig, sample_grid_shape
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.models import DBCNN, DBCNNConfig
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

MODEL = DBCNNConfig(
    boundary_filters=(4, 8, 12, 16),
    boundary_kernel_sizes=(13, 11, 9, 7),
    spp_levels=(2, 3, 5, 8, 13),
    mlp_units=(128, 64),
    n_modes=16,
    final_filters=(12, 8, 4, 1),
    final_kernel_sizes=(7, 5, 3, 3),
    final_regular_conv_stages=2,
)

DATA = NumericalConfig(
    batch_size=32,
    grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
    rhs="zero",
    nonzero_boundaries=("left",),
    boundary_mode_range=(2, 6),
    # unit-peak BCs: the DBCNN's output is peak-normalized by construction and
    # the combined PCNN always feeds it unit-normalized boundaries
    magnitude_range=(1.0, 1.0),
)

LOSS = losses.LossConfig(
    mse_weight=1.0, mae_weight=0.2, integral_weight=0.0,
    global_batch_size=DATA.batch_size,
)


def rel_l2(err, target):
    num = jnp.linalg.norm(err.reshape(err.shape[0], -1), axis=1)
    den = jnp.linalg.norm(target.reshape(target.shape[0], -1), axis=1)
    return num / den


def evaluate(model, params, n_batches=4, seed=20_000):
    errs = []
    for i in range(n_batches):
        shape = (97, 97) if i % 2 == 0 else (65, 97)
        batch = generate_numerical_batch(jax.random.PRNGKey(seed + i), DATA, shape)
        pred = model.apply(params, batch["boundaries"]["left"], batch["dx"], shape[0])
        errs.append(np.asarray(rel_l2(pred - batch["soln"], batch["soln"])))
    e = np.concatenate(errs)
    return {"rel_l2_mean": float(e.mean()), "rel_l2_median": float(np.median(e)),
            "rel_l2_p90": float(np.percentile(e, 90)), "n": int(e.size)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-only", default=None)
    p.add_argument("--out", default="/root/repo/checkpoints/dbcnn_demo")
    args = p.parse_args()

    model = DBCNN(MODEL)
    rng = np.random.default_rng(1)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97
        )
    params = jax.device_put(params, jax.devices()[0])

    if args.eval_only:
        params, _ = restore_checkpoint(args.eval_only, params)
        print(json.dumps(evaluate(model, params)))
        return

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 200, args.steps, args.lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    step_cache = {}

    def make_step(shape):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_numerical_batch(key, DATA, shape)
                pred = model.apply(p, batch["boundaries"]["left"], batch["dx"], shape[0])
                return losses.loss_wrapper(
                    LOSS, batch["soln"], pred, jnp.zeros_like(batch["soln"]), batch["dx"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    key = jax.random.PRNGKey(2)
    t0 = time.time()
    running = []
    best_window = [float("inf")]
    best_params = [None]
    for it in range(args.steps):
        shape = sample_grid_shape(rng, DATA.grids)
        if shape not in step_cache:
            print(f"[{it}] compiling shape {shape}", flush=True)
            step_cache[shape] = make_step(shape)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_cache[shape](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 200 == 0:
            window = float(np.mean(running[-200:]))
            print(
                f"step {it+1}: loss={window:.5f} "
                f"({(it+1)/(time.time()-t0):.2f} steps/s)",
                flush=True,
            )
            if not np.isfinite(running[-1]):
                raise FloatingPointError("loss diverged")
            if window < best_window[0]:
                best_window[0] = window
                best_params[0] = jax.device_get(params)

    os.makedirs(args.out, exist_ok=True)
    if best_params[0] is not None and best_window[0] < float(np.mean(running[-200:])):
        params = jax.device_put(best_params[0], jax.devices()[0])
        print(f"using best-window params (loss {best_window[0]:.5f})", flush=True)
    path = save_checkpoint(args.out, params, args.steps)
    metrics = evaluate(model, params)
    metrics["final_train_loss"] = float(np.mean(running[-200:]))
    metrics["checkpoint"] = path
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
