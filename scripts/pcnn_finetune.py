"""End-to-end fine-tune of the combined PCNN starting from the independently
trained HPNN + DBCNN demo checkpoints (the reference's `pcnn_end_to_end.py`
workflow: compose trained components, then train the composition on full
problems — random RHS + four nonzero Dirichlet boundaries).

The round-1 combined eval showed ~2x the component-level errors (13.7% mean);
this closes that gap by training the superposition end to end. Writes
checkpoint + eval.json under checkpoints/pcnn_finetuned/.

Usage: python scripts/pcnn_finetune.py [--steps N]
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
from poisson_cnn_tpu.data import GridSamplingConfig
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.models import DBCNN, HPNN, PCNN, PCNNConfig
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint
import train_hpnn_demo as hdemo
import train_dbcnn_demo as ddemo


def make_data_cfg(field_type: str) -> NumericalConfig:
    return NumericalConfig(
        batch_size=16,
        grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
        rhs="random",
        nonzero_boundaries=("left", "right", "top", "bottom"),
        boundary_mode_range=(2, 6),
        rhs_mode_range=(1, 6),
        field_type=field_type,
    )


def evaluate(model, params, field_type, n_batches=4, seed=30_000):
    data_cfg = make_data_cfg(field_type)
    errs = []
    for i in range(n_batches):
        shape = (97, 97) if i % 2 == 0 else (65, 97)
        batch = generate_numerical_batch(jax.random.PRNGKey(seed + i), data_cfg, shape)
        b = batch["boundaries"]
        pred = model.apply(
            params, batch["rhs"], b["left"], b["top"], b["right"], b["bottom"],
            batch["dx"],
        )
        d = (pred - batch["soln"]).reshape(pred.shape[0], -1)
        s = batch["soln"].reshape(pred.shape[0], -1)
        errs.append(np.asarray(jnp.linalg.norm(d, axis=1) / jnp.linalg.norm(s, axis=1)))
    e = np.concatenate(errs)
    return {"rel_l2_mean": float(e.mean()), "rel_l2_median": float(np.median(e)),
            "rel_l2_p90": float(np.percentile(e, 90)), "n": int(e.size)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--hpnn", default="/root/repo/checkpoints/hpnn_demo_big/step_25000")
    p.add_argument("--dbcnn", default="/root/repo/checkpoints/dbcnn_demo/step_15000")
    p.add_argument("--field-type", default="series",
                   help="training distribution; 'series' matches what the "
                   "components were trained on, 'coarse_noise' is the "
                   "reference's distribution, 'mix' alternates both (one "
                   "artifact that holds up on either — round-3 VERDICT #4)")
    p.add_argument("--continue-from", default=None,
                   help="restore combined PCNN params from this checkpoint "
                   "instead of composing the component checkpoints")
    p.add_argument("--fast", action="store_true",
                   help="compose HPNNFast + DBCNNFast checkpoints (step dirs "
                   "whose parents hold config.json) instead of the demo pair")
    p.add_argument("--out", default="/root/repo/checkpoints/pcnn_finetuned")
    args = p.parse_args()

    if args.fast:
        from pcnn_combined_eval import build_fast

        model, params = build_fast(args.hpnn, args.dbcnn, jacobi=0)
        cfg = model.cfg
    else:
        cfg = PCNNConfig(
            hpnn=hdemo.BIG_MODEL,
            dbcnn=ddemo.MODEL,
            hpnn_scale_mode="match_peak_laplacian",
            jacobi_iterations=0,
        )
        model = PCNN(cfg)

        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            hpnn_params = HPNN(hdemo.BIG_MODEL).init(
                jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)), jnp.full((1, 1), 0.01)
            )
            dbcnn_params = DBCNN(ddemo.MODEL).init(
                jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97
            )
        hpnn_params, _ = restore_checkpoint(os.path.abspath(args.hpnn), hpnn_params)
        dbcnn_params, _ = restore_checkpoint(os.path.abspath(args.dbcnn), dbcnn_params)
        params = {
            "params": {
                "HPNN_0": hpnn_params["params"],
                "DBCNN_0": dbcnn_params["params"],
            }
        }
    if args.continue_from:
        params, _ = restore_checkpoint(os.path.abspath(args.continue_from), params)
    params = jax.device_put(params, jax.devices()[0])

    field_types = (
        ("series", "coarse_noise") if args.field_type == "mix"
        else (args.field_type,)
    )
    data_cfgs = {ft: make_data_cfg(ft) for ft in field_types}
    loss_cfg = losses.LossConfig(
        mse_weight=1.0, mae_weight=0.2,
        global_batch_size=data_cfgs[field_types[0]].batch_size,
    )
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 100, args.steps, args.lr * 0.1
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    from poisson_cnn_tpu.data import sample_grid_shape

    rng = np.random.default_rng(0)
    step_cache = {}

    def make_step(shape, field_type):
        data_cfg = data_cfgs[field_type]

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_numerical_batch(key, data_cfg, shape)
                b = batch["boundaries"]
                pred = model.apply(
                    p, batch["rhs"], b["left"], b["top"], b["right"], b["bottom"],
                    batch["dx"],
                )
                return losses.loss_wrapper(
                    loss_cfg, batch["soln"], pred, batch["rhs"], batch["dx"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    key = jax.random.PRNGKey(42)
    t0 = time.time()
    running = []
    best = [float("inf"), None]
    os.makedirs(args.out, exist_ok=True)
    for it in range(args.steps):
        ft = field_types[rng.integers(len(field_types))]
        shape = sample_grid_shape(rng, data_cfgs[ft].grids)
        if (shape, ft) not in step_cache:
            print(f"[{it}] compiling shape {shape} ({ft})", flush=True)
            step_cache[(shape, ft)] = make_step(shape, ft)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_cache[(shape, ft)](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 200 == 0:
            window = float(np.mean(running[-200:]))
            print(f"step {it+1}: loss={window:.5f} "
                  f"({(it+1)/(time.time()-t0):.2f} steps/s)", flush=True)
            if not np.isfinite(running[-1]):
                raise FloatingPointError("loss diverged")
            if window < best[0]:
                best[0] = window
                best[1] = jax.device_get(params)
                save_checkpoint(args.out, best[1], it + 1)

    if best[1] is not None and best[0] < float(np.mean(running[-200:])):
        params = jax.device_put(best[1], jax.devices()[0])
        print(f"using best-window params (loss {best[0]:.5f})", flush=True)
    # prune intermediate best-window checkpoints, keep one final
    final = save_checkpoint(args.out, params, args.steps)
    metrics = {"train_field_type": args.field_type,
               "final_train_loss": float(np.mean(running[-200:])),
               "checkpoint": final}
    metrics["fast"] = bool(args.fast)
    model_j20 = PCNN(dataclasses.replace(cfg, jacobi_iterations=20))
    for ft in ("series", "coarse_noise"):
        metrics[f"eval_{ft}"] = evaluate(model, params, ft)
        print(ft, metrics[f"eval_{ft}"], flush=True)
        # the reference PCNN's jacobi_iterations cleanup path
        # (models/Poisson_CNN_Legacy.py:11,48-49) — same params, 20 sweeps
        metrics[f"eval_{ft}_jacobi20"] = evaluate(model_j20, params, ft)
        print(f"{ft}+j20", metrics[f"eval_{ft}_jacobi20"], flush=True)
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
