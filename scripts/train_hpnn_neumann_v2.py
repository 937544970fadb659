"""Neumann HPNN v2: coarse-noise robustness fine-tune (round-5 VERDICT #8).

The v1 Neumann artifact (checkpoints/hpnn_neumann, cosine-series data only)
scores 5.7% in-family but ~47% on the Neumann-ized coarse-noise protocol —
the same out-of-family gap the Dirichlet family had before the coarse-mix
recipe. This run seed-continues v1 with a heavy mix of Neumann coarse-noise
steps: RHS = coarse random noise projected onto the solvable subspace
(weighted zero mean), truth from the exact DCT-I vertex Neumann solve,
unit-peak training convention (rhs pair-consistently peaked, target re-peaked).

Reference behavior covered: the deployed NS solver's Neumann HPNN
(`Navier_Stokes_2D/solvers.py:29-33`), trained per
`experiments/hpnn_neumann.json` but robust off the series family.

Usage: python scripts/train_hpnn_neumann_v2.py [--steps N] [--mix-coarse F]
"""

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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
from poisson_cnn_tpu.data.numerical import _random_coarse_noise_nd
from poisson_cnn_tpu.evaluation import evaluate_hpnn, evaluate_hpnn_coarse_noise
from poisson_cnn_tpu.models import HPNN
from poisson_cnn_tpu.ops import (
    set_max_magnitude_in_batch,
    set_max_magnitude_in_batch_and_return_scaling_factors,
)
from poisson_cnn_tpu.solvers import poisson_solve_neumann_vertex
from poisson_cnn_tpu.api import _load_hpnn_config
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

GRIDS = GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32)
DATA = ReverseConfig(
    batch_size=32,
    grids=GRIDS,
    fourier_mode_range=(1, 6),
    bc="neumann",
    include_taylor=False,
    normalizations=Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True),
)
LOSS = losses.LossConfig(
    mse_weight=1.0, mae_weight=0.2, integral_weight=0.0, global_batch_size=32
)


def _trapezoid_project(rhs):
    w0 = jnp.ones((rhs.shape[1],)).at[0].set(0.5).at[-1].set(0.5)
    w1 = jnp.ones((rhs.shape[2],)).at[0].set(0.5).at[-1].set(0.5)
    W = (w0[:, None] * w1[None, :])[None, :, :, None]
    return rhs - jnp.sum(rhs * W, axis=(1, 2, 3), keepdims=True) / jnp.sum(W)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--lr", type=float, default=5e-5)
    p.add_argument("--mix-coarse", type=float, default=0.75)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--eval-only", default=None)
    p.add_argument(
        "--continue-from",
        default="/root/repo/checkpoints/hpnn_neumann/step_12000",
    )
    p.add_argument("--out", default="/root/repo/checkpoints/hpnn_neumann_v2")
    args = p.parse_args()

    cfg = _load_hpnn_config("/root/repo/checkpoints/hpnn_neumann")
    model = HPNN(cfg)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)), jnp.full((1, 1), 0.01)
        )

    def evaluate(params):
        apply_fn = jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))
        return {
            "in_family": evaluate_hpnn(
                apply_fn, DATA, grid_shapes=((97, 97), (65, 129))
            ),
            "coarse_noise_neumann": evaluate_hpnn_coarse_noise(
                apply_fn, bc_type="neumann"
            ),
        }

    if args.eval_only:
        params, _ = restore_checkpoint(os.path.abspath(args.eval_only), params)
        print(json.dumps(evaluate(params), indent=2))
        return

    params, _ = restore_checkpoint(os.path.abspath(args.continue_from), params)
    params = jax.device_put(params, jax.devices()[0])

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 200, args.steps, args.lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    series_cache, coarse_cache = {}, {}

    def make_series_step(shape):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_batch(key, DATA, shape)
                pred = model.apply(p, batch["rhs"], batch["dx"])
                return losses.loss_wrapper(
                    LOSS, batch["soln"], pred, batch["rhs"], batch["dx"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    def make_coarse_step(shape):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                k_dx, k_rhs = jax.random.split(key)
                dx = jax.random.uniform(
                    k_dx, (DATA.batch_size, 1), minval=5e-3, maxval=5e-2
                )
                rhs = _random_coarse_noise_nd(
                    k_rhs, DATA.batch_size, shape, (0.5, 1.5)
                )
                rhs = _trapezoid_project(rhs)
                soln = poisson_solve_neumann_vertex(rhs, dx, mode="fd")
                rhs, f = set_max_magnitude_in_batch_and_return_scaling_factors(
                    rhs, 1.0
                )
                soln = soln * f.reshape((-1, 1, 1, 1))
                soln = set_max_magnitude_in_batch(soln, 1.0)
                pred = model.apply(p, rhs, dx)
                return losses.loss_wrapper(LOSS, soln, pred, rhs, dx)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    rng = np.random.default_rng(args.seed)
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    running = []
    best = [float("inf"), None]
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=2)
    for it in range(args.steps):
        shape = sample_grid_shape(rng, GRIDS)
        use_coarse = rng.random() < args.mix_coarse
        cache, factory = (
            (coarse_cache, make_coarse_step) if use_coarse
            else (series_cache, make_series_step)
        )
        if shape not in cache:
            print(f"[{it}] compiling {'coarse ' if use_coarse else ''}{shape}",
                  flush=True)
            cache[shape] = factory(shape)
        key, sub = jax.random.split(key)
        params, opt_state, loss = cache[shape](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 250 == 0:
            window = float(np.mean(running[-250:]))
            print(f"step {it+1}: loss={window:.5f} "
                  f"({(it+1)/(time.time()-t0):.2f} steps/s)", flush=True)
            if not np.isfinite(running[-1]):
                raise FloatingPointError("loss diverged")
            if window < best[0]:
                best[0] = window
                best[1] = jax.device_get(params)
                save_checkpoint(args.out, best[1], it + 1)

    if best[1] is not None and best[0] < float(np.mean(running[-250:])):
        params = jax.device_put(best[1], jax.devices()[0])
        print(f"using best-window params (loss {best[0]:.5f})", flush=True)
    path = save_checkpoint(args.out, params, args.steps)
    metrics = evaluate(params)
    metrics["final_train_loss"] = float(np.mean(running[-250:]))
    metrics["checkpoint"] = path
    metrics["steps"] = args.steps
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
