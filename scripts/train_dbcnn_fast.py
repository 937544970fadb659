"""Train DBCNNFast — the spectrally-informed boundary Laplace solver (round-3
VERDICT #4: "an HPNNFast-style redesign of the DBCNN 2-D stage").

The analytic prior is already discrete-exact for band-limited (series)
boundaries, so training focuses on the coarse-noise family (the reference's
own boundary distribution, `poisson_CNN/dataset/generators/numerical.py:37-72`)
where the truncated DST leaves a real out-of-band remainder; a series fraction
keeps the trunk from drifting on in-band data.

Writes checkpoints/dbcnn_fast/{step_*, config.json, eval.json}.

Usage: python scripts/train_dbcnn_fast.py [--steps N] [--coarse-frac F]
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
from poisson_cnn_tpu.data import GridSamplingConfig, sample_grid_shape
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.models import DBCNNFast, DBCNNFastConfig
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

MODEL = DBCNNFastConfig(
    n_modes=0,  # full band: the prior is the exact discrete one-edge solution
    input_space_to_depth=4,
    stem_filters=48,
    scale_filters=(96,),
    convs_per_scale=2,
    head_filters=48,
    cond_mlp_units=(64, 64),
    dtype="bfloat16",
)

GRIDS = GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32)


def data_cfg(field_type):
    return NumericalConfig(
        batch_size=32,
        grids=GRIDS,
        rhs="zero",
        nonzero_boundaries=("left",),
        boundary_mode_range=(2, 6),
        # unit-peak BCs: output is peak-normalized and the PCNN feeds
        # unit-normalized boundaries
        magnitude_range=(1.0, 1.0),
        field_type=field_type,
    )


LOSS = losses.LossConfig(
    mse_weight=1.0, mae_weight=0.2, integral_weight=0.0, global_batch_size=32
)


def evaluate(model, params, n_batches=4, seed=20_000):
    out = {}
    for ft in ("series", "coarse_noise"):
        cfg = data_cfg(ft)
        errs = []
        for i in range(n_batches):
            shape = (97, 97) if i % 2 == 0 else (65, 97)
            batch = generate_numerical_batch(jax.random.PRNGKey(seed + i), cfg, shape)
            pred = model.apply(
                params, batch["boundaries"]["left"], batch["dx"], shape[0]
            )
            d = (pred - batch["soln"]).reshape(pred.shape[0], -1)
            s = batch["soln"].reshape(pred.shape[0], -1)
            errs.append(
                np.asarray(jnp.linalg.norm(d, axis=1) / jnp.linalg.norm(s, axis=1))
            )
        e = np.concatenate(errs)
        out[ft] = {
            "rel_l2_mean": float(e.mean()),
            "rel_l2_median": float(np.median(e)),
            "rel_l2_p90": float(np.percentile(e, 90)),
            "n": int(e.size),
        }
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=10000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--coarse-frac", type=float, default=0.7)
    p.add_argument("--eval-only", default=None)
    p.add_argument("--out", default="/root/repo/checkpoints/dbcnn_fast")
    args = p.parse_args()

    model = DBCNNFast(MODEL)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97
        )
    params = jax.device_put(params, jax.devices()[0])

    if args.eval_only:
        params, _ = restore_checkpoint(os.path.abspath(args.eval_only), params)
        print(json.dumps(evaluate(model, params), indent=2))
        return

    if args.steps == 0:
        # With n_modes=0 the analytic prior is the exact discrete one-edge
        # solution for ANY boundary (fp32 round-off ~5e-6), so the
        # zero-initialized trunk is already the optimum on this family and
        # adam noise could only degrade it. Save the init as the artifact;
        # trainability of the trunk is covered by
        # tests/test_models.py::test_dbcnn_fast_coarse_noise_prior_reasonable_and_trainable.
        os.makedirs(args.out, exist_ok=True)
        with open(os.path.join(args.out, "config.json"), "w") as f:
            json.dump(dataclasses.asdict(MODEL), f, indent=2)
        path = save_checkpoint(args.out, params, 0)
        metrics = evaluate(model, params)
        metrics["checkpoint"] = path
        metrics["steps"] = 0
        metrics["note"] = (
            "full-band DST prior (n_modes=0) is the exact discrete one-edge "
            "Laplace solution; the zero-initialized residual trunk is the "
            "optimum on this family, so the artifact is the untrained init"
        )
        with open(os.path.join(args.out, "eval.json"), "w") as f:
            json.dump(metrics, f, indent=2)
        print(json.dumps(metrics, indent=2))
        return

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 200, args.steps, args.lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    cfgs = {ft: data_cfg(ft) for ft in ("series", "coarse_noise")}
    cache = {}

    def make_step(shape, ft):
        cfg = cfgs[ft]

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_numerical_batch(key, cfg, shape)
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

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    running = []
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(MODEL), f, indent=2)
    for it in range(args.steps):
        ft = "coarse_noise" if rng.random() < args.coarse_frac else "series"
        shape = sample_grid_shape(rng, GRIDS)
        if (shape, ft) not in cache:
            print(f"[{it}] compiling {shape} ({ft})", flush=True)
            cache[(shape, ft)] = make_step(shape, ft)
        key, sub = jax.random.split(key)
        params, opt_state, loss = cache[(shape, ft)](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 250 == 0:
            print(
                f"step {it+1}: loss={np.mean(running[-250:]):.5f} "
                f"({(it+1)/(time.time()-t0):.2f} steps/s)",
                flush=True,
            )
            if not np.isfinite(running[-1]):
                raise FloatingPointError("loss diverged")

    path = save_checkpoint(args.out, params, args.steps)
    metrics = evaluate(model, params)
    metrics["final_train_loss"] = float(np.mean(running[-250:]))
    metrics["checkpoint"] = path
    metrics["steps"] = args.steps
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
