"""Train a 3-D HPNN on streaming 3-D reverse-mode data — a capability the
reference defines but never ships working (its N-D model's __init__ is broken,
SURVEY.md §1): here the rank-agnostic HPNN (models/hpnn.py) trains end-to-end
in 3-D and evaluates against the analytic solutions.

Protocol mirrors the 2-D demo: unit-peak targets (pair-consistent rescale) +
bounded unit-peak output, plain Adam cosine, variable 3-D grids (33-49 per
axis), rel-L2 eval on held-out batches. Writes checkpoint + eval.json under
checkpoints/hpnn_3d/.

Usage: python scripts/train_hpnn_3d.py [--steps N] [--eval-only CKPT]
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

from poisson_cnn_tpu.data.reverse_nd import ReverseNDConfig, generate_batch_nd
from poisson_cnn_tpu.models import HPNN, HPNNConfig
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

MODEL = HPNNConfig(
    pre_filters=(8, 16),
    pre_kernel_sizes=(5, 3),
    deconv_downsampling_factors=(2, 4),
    deconv_kernel_sizes=(2, 4),
    deconv_conv_kernel_sizes=(3, 3),
    resize_downsampling_factors=(8,),
    resize_conv_kernel_sizes=(3,),
    resize_methods=("bilinear",),
    bottleneck_filters=16,
    bottleneck_n_convs=2,
    bottleneck_use_resnet=True,
    final_filters=(16, 8, 1),
    final_kernel_sizes=(5, 3, 3),
    final_regular_conv_stages=1,
    dx_mlp_units=(32, 32),
    output_scaling=None,  # see instability note below
    # GroupNorm: every successful momentum-SGD tail in the round-2 studies ran
    # on a normalized stack (demo --norm, refgrid/flagship batchnorm); the
    # unnormalized 3-D stack's tail blew the 0.015 basin up to ~0.09
    use_batchnorm=True,
)

DATA = ReverseNDConfig(batch_size=8, dx_range=(5e-3, 5e-2),
                       fourier_mode_range=(1, 5))

# static 3-D shape rotation (reverse_nd has no AR sampler; 4 buckets)
SHAPES = ((33, 33, 33), (49, 33, 33), (33, 49, 33), (33, 33, 49))


def _unit_peak_pair(batch):
    nd = batch["soln"].ndim - 2
    speak = jnp.max(
        jnp.abs(batch["soln"]).reshape(batch["soln"].shape[0], -1), axis=1
    ).reshape((-1,) + (1,) * (nd + 1)) + 1e-30
    return batch["rhs"] / speak, batch["soln"] / speak, batch["dx"]


def evaluate(model, params, n_batches=8, seed=50_000):
    errs = []
    for i in range(n_batches):
        shape = SHAPES[i % len(SHAPES)]
        batch = generate_batch_nd(jax.random.PRNGKey(seed + i), DATA, shape)
        rhs, soln, dx = _unit_peak_pair(batch)
        pred = jax.jit(model.apply)(params, rhs, dx)
        d = (pred - soln).reshape(pred.shape[0], -1)
        s = soln.reshape(pred.shape[0], -1)
        errs.append(np.asarray(jnp.linalg.norm(d, axis=1) / jnp.linalg.norm(s, axis=1)))
    e = np.concatenate(errs)
    return {"rel_l2_mean": float(e.mean()), "rel_l2_median": float(np.median(e)),
            "rel_l2_p90": float(np.percentile(e, 90)), "n": int(e.size)}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=8000)
    p.add_argument("--opt", default="two-phase", choices=["two-phase", "adam"],
                   help="'adam' = plain Adam with full-horizon cosine to "
                   "zero (short runs settle into the early basin instead of "
                   "walking out of it)")
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--eval-only", default=None)
    p.add_argument("--out", default="/root/repo/checkpoints/hpnn_3d")
    args = p.parse_args()

    model = HPNN(MODEL)
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 49, 49, 49, 1)),
            jnp.full((1, 3), 0.01),
        )
    params = jax.device_put(params, jax.devices()[0])

    if args.eval_only:
        params, _ = restore_checkpoint(args.eval_only, params)
        print(json.dumps(evaluate(model, params)))
        return

    # two-phase adam->sgd: this is the deep HPNN family, and the drift study's
    # Adam flat-direction walk shows up in 3-D too (plain-Adam run: loss 0.015
    # at step 600 climbing back to 0.098 by 3000). Basin arrives early here.
    from poisson_cnn_tpu.train.loop import two_phase_adam_sgd

    if args.opt == "adam":
        inner = optax.adam(optax.warmup_cosine_decay_schedule(
            0.0, args.lr, 100, args.steps, 0.0))
    else:
        inner = two_phase_adam_sgd(
            args.lr, max(1, int(args.steps * 0.25)), args.steps,
            tail_lr_mult=5.0,
        )
    tx = optax.chain(optax.clip_by_global_norm(1.0), inner)
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    step_cache = {}

    def make_step(shape):
        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_batch_nd(key, DATA, shape)
                rhs, soln, dx = _unit_peak_pair(batch)
                pred = model.apply(p, rhs, dx)
                return jnp.mean((pred - soln) ** 2) + 0.2 * jnp.mean(
                    jnp.abs(pred - soln)
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    running = []
    best = [float("inf"), None]
    os.makedirs(args.out, exist_ok=True)
    for it in range(args.steps):
        shape = SHAPES[rng.integers(len(SHAPES))]
        if shape not in step_cache:
            print(f"[{it}] compiling shape {shape}", flush=True)
            step_cache[shape] = make_step(shape)
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_cache[shape](params, opt_state, sub)
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
    final = save_checkpoint(args.out, params, args.steps)
    metrics = evaluate(model, params)
    metrics["final_train_loss"] = float(np.mean(running[-200:]))
    metrics["checkpoint"] = final
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
