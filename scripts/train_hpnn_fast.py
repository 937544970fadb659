"""Train HPNN-Fast (the FLOP-reduced production-inference Poisson solver) on
variable-grid reverse-mode data and evaluate rel-L2 with the same protocol as
the flagship demo (`scripts/train_hpnn_demo.py`), so the accuracy-parity claim
for the headline benchmark is reproducible.

Writes checkpoint + config.json + eval.json under checkpoints/hpnn_fast/;
`bench.py` picks up config.json via `models.hpnn_fast.load_fast_config`.

Usage: python scripts/train_hpnn_fast.py [--steps N] [--eval-only CKPT]
"""

import argparse
import dataclasses
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
from poisson_cnn_tpu.evaluation import evaluate_hpnn
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

# benchmark config + bounded unit-peak output (same reference output-scaling
# mode the flagship demo uses to keep streaming Adam training stable)
MODEL = HPNNFastConfig(output_scaling="soln_max_magnitude")

DATA = ReverseConfig(
    batch_size=32,
    grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
    fourier_mode_range=(1, 6),
    taylor_degree_range=(2, 5),
    bc="dirichlet",
    normalizations=Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True),
)

LOSS = losses.LossConfig(
    mse_weight=1.0, mae_weight=0.2, integral_weight=0.0,
    global_batch_size=DATA.batch_size,
)


def evaluate(model, params, grid_shapes=((97, 97), (65, 129))):
    apply_fn = jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))
    return evaluate_hpnn(apply_fn, DATA, grid_shapes=grid_shapes)


def main():
    global DATA
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=12000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--eval-only", default=None)
    p.add_argument(
        "--large-grids", action="store_true",
        help="train/eval in the 192-384 regime (257 lattice) instead of "
        "64-128: the bench headline (solves/sec @256^2) should pair with "
        "accuracy measured at the same grid scale",
    )
    p.add_argument(
        "--xl-grids", action="store_true",
        help="train/eval in the 384-513 regime (385/513 lattice)",
    )
    p.add_argument(
        "--config-json", default=None,
        help="path to an HPNNFastConfig JSON overriding the default MODEL "
        "(e.g. a bench_fast_sweep.py winner to be trained for its accuracy row)",
    )
    p.add_argument("--out", default="/root/repo/checkpoints/hpnn_fast")
    args = p.parse_args()

    global MODEL
    if args.config_json:
        with open(args.config_json) as f:
            d = json.load(f)
        for k in ("scale_filters", "dx_mlp_units"):
            if k in d:
                d[k] = tuple(d[k])
        MODEL = HPNNFastConfig(**d)

    eval_shapes = ((97, 97), (65, 129))
    if args.large_grids:
        import dataclasses as _dc

        DATA = _dc.replace(
            DATA,
            batch_size=16,
            grids=GridSamplingConfig(((192, 384), (192, 384)), (5e-3, 5e-2),
                                     snap=128),
            fourier_mode_range=(1, 8),
            taylor_degree_range=(2, 6),
        )
        eval_shapes = ((257, 257), (321, 257))
    if args.xl_grids:
        import dataclasses as _dc

        DATA = _dc.replace(
            DATA,
            batch_size=8,
            grids=GridSamplingConfig(((384, 513), (384, 513)), (2e-3, 8e-3),
                                     snap=128),
            fourier_mode_range=(1, 10),
            taylor_degree_range=(2, 6),
        )
        eval_shapes = ((385, 385), (513, 385))

    model = HPNNFast(MODEL)
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 97, 97, 1)),
            jnp.full((1, 1), 0.01),
        )
    params = jax.device_put(params, jax.devices()[0])

    if args.eval_only:
        params, _ = restore_checkpoint(args.eval_only, params)
        print(json.dumps(evaluate(model, params, eval_shapes)))
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
                batch = generate_batch(key, DATA, shape)
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
    best_window = [float("inf")]
    best_params = [None]
    os.makedirs(args.out, exist_ok=True)
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
                save_checkpoint(args.out, best_params[0], it + 1)

    if best_params[0] is not None and best_window[0] < float(np.mean(running[-200:])):
        params = jax.device_put(best_params[0], jax.devices()[0])
        print(f"using best-window params (loss {best_window[0]:.5f})", flush=True)
    path = save_checkpoint(args.out, params, args.steps)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(MODEL), f, indent=2)
    metrics = evaluate(model, params, eval_shapes)
    metrics["final_train_loss"] = float(np.mean(running[-200:]))
    metrics["checkpoint"] = path
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
