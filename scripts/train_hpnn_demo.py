"""Train a mid-size HPNN on variable-grid reverse-mode data and evaluate
relative-L2 accuracy against held-out analytic solutions.

Reproducible accuracy demonstration (BASELINE.md bar, stated explicitly as
<=5% mean relative-L2 error on variable-size grids). Runs on whatever accelerator the environment
provides; writes a checkpoint + eval.json under checkpoints/hpnn_demo/.

Usage: python scripts/train_hpnn_demo.py [--steps N] [--eval-only CKPT]
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
from poisson_cnn_tpu.models import HPNN, HPNNConfig
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

MODEL = HPNNConfig(
    pre_filters=(8, 16),
    pre_kernel_sizes=(9, 7),
    deconv_downsampling_factors=(2, 4, 8),
    deconv_kernel_sizes=(2, 4, 8),
    deconv_conv_kernel_sizes=(7, 5, 5),
    resize_downsampling_factors=(16,),
    resize_conv_kernel_sizes=(5,),
    resize_methods=("bilinear",),
    bottleneck_filters=24,
    bottleneck_n_convs=2,
    bottleneck_use_resnet=True,
    final_filters=(24, 12, 6, 1),
    final_kernel_sizes=(7, 5, 3, 3),
    final_regular_conv_stages=2,
    dx_mlp_units=(64, 64),
    # bounded unit-peak output (a reference output-scaling mode): without it,
    # unconstrained predictions enter a positive feedback loop under streaming
    # Adam training (preds grow -> grads grow -> clip can't stop the drift)
    output_scaling="soln_max_magnitude",
)

BIG_MODEL = HPNNConfig(
    pre_filters=(8, 16, 32),
    pre_kernel_sizes=(11, 9, 7),
    deconv_downsampling_factors=(2, 4, 8, 16),
    deconv_kernel_sizes=(2, 4, 8, 16),
    deconv_conv_kernel_sizes=(7, 7, 5, 5),
    resize_downsampling_factors=(32,),
    resize_conv_kernel_sizes=(5,),
    resize_methods=("bilinear",),
    bottleneck_filters=32,
    bottleneck_n_convs=2,
    bottleneck_use_resnet=True,
    final_filters=(32, 16, 8, 4, 1),
    final_kernel_sizes=(7, 5, 5, 3, 3),
    final_regular_conv_stages=2,
    dx_mlp_units=(100, 100),
    output_scaling="soln_max_magnitude",
    use_batchnorm=True,  # GroupNorm here; the reference config also normalizes
)

DATA = ReverseConfig(
    batch_size=32,
    grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
    fourier_mode_range=(1, 6),
    taylor_degree_range=(2, 5),
    bc="dirichlet",
    normalizations=Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True),
)

# Targets are unit-peak solutions (soln_max_magnitude normalization) so a
# plain MSE+MAE objective is well conditioned; peak-magnitude loss weighting
# over 1/L_max^2-scaled targets (which span ~4 orders of magnitude) diverges.
LOSS = losses.LossConfig(
    mse_weight=1.0, mae_weight=0.2, integral_weight=0.0,
    global_batch_size=DATA.batch_size,
)


def rel_l2(pred, target):
    num = jnp.linalg.norm(pred.reshape(pred.shape[0], -1), axis=1)
    den = jnp.linalg.norm(target.reshape(target.shape[0], -1), axis=1)
    return num / den


def evaluate(model, params, n_batches=4, seed=10_000):
    errs = []
    for i in range(n_batches):
        shape = (97, 97) if i % 2 == 0 else (65, 129)
        batch = generate_batch(jax.random.PRNGKey(seed + i), DATA, shape)
        pred = jax.jit(model.apply, static_argnames=())(
            params, batch["rhs"], batch["dx"]
        )
        errs.append(np.asarray(rel_l2(pred - batch["soln"], batch["soln"])))
    e = np.concatenate(errs)
    return {"rel_l2_mean": float(e.mean()), "rel_l2_median": float(np.median(e)),
            "rel_l2_p90": float(np.percentile(e, 90)), "n": int(e.size)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=3000)
    p.add_argument("--big", action="store_true")
    p.add_argument("--neumann", action="store_true")
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--eval-only", default=None)
    p.add_argument("--out", default="/root/repo/checkpoints/hpnn_demo")
    p.add_argument(
        "--matmul-precision", default=None,
        choices=["default", "float32", "highest"],
        help="jax default_matmul_precision override. TPU fp32 convs/matmuls "
        "run at bf16 mantissa by default — the prime suspect for the "
        "TPU-only late-training drift; 'highest' forces true fp32.",
    )
    p.add_argument(
        "--norm", action="store_true",
        help="enable GroupNorm in the mid model (drift study: HPNN-Fast "
        "with norms trains stably; the unnormalized mid model drifts)",
    )
    p.add_argument(
        "--wd", type=float, default=1e-4,
        help="adamw decoupled weight decay. Adam's flat-direction random "
        "walk grows pnorm^2 by ~d*lr^2/step; adamw's pull is 2*lr*wd*pnorm^2 "
        "per step, so equilibrium pnorm^2 = d*lr/(2*wd). Holding pnorm at "
        "init scale (~33) for the ~1e6-param mid model at lr 1e-4 needs "
        "wd ~ 5e-2; the 1e-4 of run G was ~500x too weak to anchor.",
    )
    p.add_argument(
        "--switch-step", type=int, default=1000,
        help="for --opt adam-sgd: step at which to switch from Adam to the "
        "momentum-SGD tail (Adam reaches its best window ~step 600-1000 "
        "before the flat-direction walk kicks it out)",
    )
    p.add_argument(
        "--opt", default="adam",
        choices=["adam", "adam-eps5", "sgd", "adamw", "adam-sgd"],
        help="optimizer A/B for the drift study: 'adam-eps5' raises Adam's "
        "eps to 1e-5 (second-moment noise floor against low-precision "
        "gradient noise); 'sgd' = momentum SGD (no adaptive scaling at all); "
        "'adamw' = decoupled weight decay 1e-4 (counteracts Adam's "
        "unit-scale random walk along the output-normalization's "
        "zero-gradient scale directions — the drift signature is steady "
        "pnorm growth tracking the loss rise).",
    )
    args = p.parse_args()

    if args.matmul_precision and args.matmul_precision != "default":
        jax.config.update("jax_default_matmul_precision", args.matmul_precision)

    import dataclasses as _dc

    global DATA
    model_cfg = BIG_MODEL if args.big else MODEL
    if args.norm:
        model_cfg = _dc.replace(model_cfg, use_batchnorm=True)
    if args.neumann:
        model_cfg = _dc.replace(model_cfg, bc_type="neumann")
        DATA = _dc.replace(DATA, bc="neumann", include_taylor=False)
    model = HPNN(model_cfg)
    rng = np.random.default_rng(0)
    init_shape = (97, 97)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1,) + init_shape + (1,)),
            jnp.full((1, 1), 0.01),
        )
    params = jax.device_put(params, jax.devices()[0])

    if args.eval_only:
        params, _ = restore_checkpoint(args.eval_only, params)
        print(json.dumps(evaluate(model, params)))
        return

    # plain Adam works once the output is bounded (weight decay erodes the
    # fit here; the earlier divergence was the unbounded output head)
    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 200, args.steps, args.lr * 0.05
    )
    if args.opt == "sgd":
        inner = optax.sgd(
            optax.warmup_cosine_decay_schedule(0.0, args.lr * 50, 200,
                                               args.steps, args.lr * 2.5),
            momentum=0.9,
        )
    elif args.opt == "adam-eps5":
        inner = optax.adam(schedule, eps=1e-5)
    elif args.opt == "adamw":
        inner = optax.adamw(schedule, weight_decay=args.wd)
    elif args.opt == "adam-sgd":
        # phase 1: Adam finds the basin fast (cosine over the Adam horizon)
        inner = optax.adam(
            optax.warmup_cosine_decay_schedule(
                0.0, args.lr, 200, args.switch_step, args.lr * 0.3
            )
        )
    else:
        inner = optax.adam(schedule)
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        inner,
    )
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    step_cache = {}

    def make_step(shape, tx):
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
    for it in range(args.steps):
        if args.opt == "adam-sgd" and it == args.switch_step:
            # phase 2: momentum-SGD tail. Gradient-proportional updates can't
            # random-walk the flat output-scale directions the way Adam's
            # unit-scale updates do (drift A/B: SGD pnorm stays exactly flat),
            # so the tail holds the basin Adam found instead of drifting out.
            print(f"[{it}] switching to momentum-SGD tail", flush=True)
            tx = optax.chain(
                optax.clip_by_global_norm(1.0),
                optax.sgd(
                    optax.cosine_decay_schedule(
                        args.lr * 10, args.steps - args.switch_step,
                        alpha=0.05,
                    ),
                    momentum=0.9,
                ),
            )
            opt_state = jax.device_put(tx.init(params), jax.devices()[0])
            step_cache.clear()
        shape = sample_grid_shape(rng, DATA.grids)
        if shape not in step_cache:
            print(f"[{it}] compiling shape {shape}", flush=True)
            step_cache[shape] = make_step(shape, tx)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_cache[shape](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 200 == 0:
            window = float(np.mean(running[-200:]))
            # global param norm: the soln_max_magnitude output normalization
            # leaves the raw-output SCALE as a zero-gradient direction, so any
            # systematic weight-norm drift is noise-driven — log it to check
            # whether the late-training loss drift tracks a param-norm walk
            pnorm = float(
                jnp.sqrt(
                    sum(jnp.sum(x.astype(jnp.float32) ** 2)
                        for x in jax.tree_util.tree_leaves(params))
                )
            )
            print(
                f"step {it+1}: loss={window:.5f} pnorm={pnorm:.3f} "
                f"({(it+1)/(time.time()-t0):.2f} steps/s)",
                flush=True,
            )
            if not np.isfinite(running[-1]):
                raise FloatingPointError("loss diverged")
            # keep the best-so-far parameters: large configs can drift late in
            # training, and the final step is not necessarily the best model
            if window < best_window[0]:
                best_window[0] = window
                best_params[0] = jax.device_get(params)
                # crash-safe: persist the best-so-far immediately (long TPU
                # runs can wedge on remote-RPC hiccups)
                os.makedirs(args.out, exist_ok=True)
                save_checkpoint(args.out, best_params[0], it + 1)

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
