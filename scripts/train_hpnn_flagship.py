"""Train the flagship HPNN (the `experiments/hpnn.json` model section, with the
reference's use_batchnorm/use_scaling restored) at reference scale: 192-384^2
variable grids, effective batch 50 via gradient accumulation, bf16 compute.

Training recipe: the demo's proven stable one (unit-peak targets + MSE/MAE)
with the two-phase optimizer from the round-2 drift study: Adam (cosine) to
find the basin fast, then a momentum-SGD tail. Adam's unit-scale updates
random-walk the output-normalization's flat weight-scale directions and kick
the deep model out of its optimum (adamw at wd 1e-4 AND 5e-2 both still
walked); SGD's gradient-proportional updates hold the basin exactly
(demo A/B `/tmp/drift_adamsgd.log`: loss 0.0045 at switch -> 0.0037 final,
pnorm frozen, eval 6.5% vs 6.7-9.4% for all Adam-only variants).

Writes checkpoint + eval.json under checkpoints/hpnn_flagship/.

Usage: python scripts/train_hpnn_flagship.py [--steps N] [--eval-only CKPT]
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
from poisson_cnn_tpu.evaluation import evaluate_hpnn
from poisson_cnn_tpu.models import HPNN
from poisson_cnn_tpu.train.config import load_experiment
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

# Single microbatch, no accumulation scan, no remat: the remote compile
# helper OOMs (SIGKILL) on the scan-wrapped / rematerialized flagship
# backward graph — both bloat compile-time memory. Batch 8 without remat
# fits HBM at 385^2; more steps substitute for the reference's batch 50.
MICROBATCH = 8
ACCUM = 1

DATA = ReverseConfig(
    batch_size=MICROBATCH,
    # snap=128 -> lattice sizes {257, 385}: 4 distinct compiled steps. The
    # remote-backend compile of the flagship fwd+bwd accum graph is ~20 min
    # per shape, so the 16 buckets of snap=64 would spend hours compiling;
    # the CNN generalizes across sizes (eval is on unseen variable grids).
    grids=GridSamplingConfig(((192, 384), (192, 384)), (5e-3, 5e-2), snap=128),
    fourier_mode_range=(1, 8),
    taylor_degree_range=(2, 6),
    bc="dirichlet",
    normalizations=Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True),
)

LOSS = losses.LossConfig(
    mse_weight=1.0, mae_weight=0.2, integral_weight=0.0,
    global_batch_size=MICROBATCH * ACCUM,
)

# demo-protocol eval data (the 7.1% flagship-demo bar) + training-scale grids
EVAL_DEMO = dataclasses.replace(
    DATA, batch_size=32,
    grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
    fourier_mode_range=(1, 6), taylor_degree_range=(2, 5),
)


from poisson_cnn_tpu.train.loop import two_phase_adam_sgd  # noqa: E402


def build_model(which: str = "flagship"):
    if which == "big":
        # fallback when the remote AOT compile helper cannot fit the full
        # hpnn.json backward graph in its memory cap (SIGKILL): the round-1
        # big architecture (same design, fewer branches/filters) trained at
        # the same reference 192-384^2 grids
        import train_hpnn_demo as hdemo

        model_cfg = dataclasses.replace(hdemo.BIG_MODEL, dtype="bfloat16")
        return HPNN(model_cfg), model_cfg
    model_cfg, _, _ = load_experiment("/root/repo/experiments/hpnn.json")
    model_cfg = dataclasses.replace(
        model_cfg,
        dtype="bfloat16",
        remat_branches=False,
        output_scaling="soln_max_magnitude",
    )
    return HPNN(model_cfg), model_cfg


def evaluate(model, params):
    apply_fn = jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))
    out = {"demo_protocol": evaluate_hpnn(apply_fn, EVAL_DEMO)}
    out["train_scale"] = evaluate_hpnn(
        apply_fn,
        dataclasses.replace(DATA, batch_size=8),
        grid_shapes=((257, 257), (321, 257)),
        n_batches=4,
        seed=20_000,
    )
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--switch-step", type=int, default=None,
                   help="step to switch from Adam to the momentum-SGD tail "
                   "(default: 35%% of --steps; the drift study's Adam basin "
                   "arrives well before the Adam walk kicks the params out)")
    p.add_argument("--eval-only", default=None)
    p.add_argument("--continue-from", default=None,
                   help="checkpoint to warm-start params from (fresh "
                   "optimizer state; the two-phase schedule restarts)")
    p.add_argument("--model", default="flagship", choices=["flagship", "big"])
    p.add_argument("--out", default="/root/repo/checkpoints/hpnn_flagship")
    args = p.parse_args()

    model, model_cfg = build_model(args.model)
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # init shape must satisfy min(shape) >= 2 * max(downsampling factor)
        # (= 256 for the flagship's ds-128 branch) or the branch-gating skips
        # param creation for the largest-scale branches
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.ones((1, 257, 257, 1)),
            jnp.full((1, 1), 0.01),
        )
    params = jax.device_put(params, jax.devices()[0])

    if args.eval_only:
        params, _ = restore_checkpoint(args.eval_only, params)
        print(json.dumps(evaluate(model, params)))
        return

    if args.continue_from:
        params, prev_step = restore_checkpoint(args.continue_from, params)
        params = jax.device_put(params, jax.devices()[0])
        print(f"continuing from {args.continue_from} (step {prev_step})",
              flush=True)

    switch_step = args.switch_step or max(1, int(args.steps * 0.35))
    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        two_phase_adam_sgd(args.lr, switch_step, args.steps),
    )
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    step_cache = {}
    gen_cache = {}

    def make_step(shape, tx):
        # Two-jit pipeline: datagen in its own executable, the train step
        # taking the batch as explicit device arrays. The FUSED graph's MLIR
        # (~730-850KB) gets the remote AOT compile helper OOM-killed for the
        # full flagship backward; split, the step compiles in ~2.5 min.
        # Intermediates stay on device — no extra host transfer.
        @jax.jit
        def gen(key):
            return generate_batch(key, DATA, shape)

        @jax.jit
        def step(params, opt_state, rhs, soln, dx):
            def loss_fn(p):
                pred = model.apply(p, rhs, dx)
                return losses.loss_wrapper(LOSS, soln, pred, rhs, dx)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        gen_cache[shape] = gen
        return step

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    running = []
    best = [float("inf"), None]
    os.makedirs(args.out, exist_ok=True)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump({"model": dataclasses.asdict(model_cfg),
                   "microbatch": MICROBATCH, "accum": ACCUM,
                   "steps": args.steps, "lr": args.lr,
                   "optimizer": "adam->momentum-sgd two-phase",
                   "switch_step": switch_step}, f, indent=2, default=str)
    metrics_log = open(os.path.join(args.out, "metrics.jsonl"), "w")
    for it in range(args.steps):
        if it == switch_step:
            # the two-phase optimizer flips to its momentum-SGD tail branch
            # at this step (traced counter — no recompile, no state swap)
            print(f"[{it}] momentum-SGD tail takes over", flush=True)
        shape = sample_grid_shape(rng, DATA.grids)
        if shape not in step_cache:
            print(f"[{it}] compiling shape {shape}", flush=True)
            step_cache[shape] = make_step(shape, tx)
        key, sub = jax.random.split(key)
        batch = gen_cache[shape](sub)
        params, opt_state, loss = step_cache[shape](
            params, opt_state, batch["rhs"], batch["soln"], batch["dx"]
        )
        running.append(float(loss))
        if (it + 1) % 100 == 0:
            window = float(np.mean(running[-100:]))
            pnorm = float(jnp.sqrt(sum(
                jnp.sum(x.astype(jnp.float32) ** 2)
                for x in jax.tree_util.tree_leaves(params))))
            rate = (it + 1) / (time.time() - t0)
            print(f"step {it+1}: loss={window:.5f} pnorm={pnorm:.2f} "
                  f"({rate:.2f} steps/s)", flush=True)
            metrics_log.write(json.dumps(
                {"step": it + 1, "loss": window, "pnorm": pnorm,
                 "steps_per_s": round(rate, 3)}) + "\n")
            metrics_log.flush()
            if not np.isfinite(running[-1]):
                raise FloatingPointError("loss diverged")
            if window < best[0]:
                best[0] = window
                best[1] = jax.device_get(params)
                save_checkpoint(args.out, best[1], it + 1)
    metrics_log.close()

    if best[1] is not None and best[0] < float(np.mean(running[-100:])):
        params = jax.device_put(best[1], jax.devices()[0])
        print(f"using best-window params (loss {best[0]:.5f})", flush=True)
    final = save_checkpoint(args.out, params, args.steps)
    metrics = evaluate(model, params)
    metrics["final_train_loss"] = float(np.mean(running[-100:]))
    metrics["checkpoint"] = final
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))


if __name__ == "__main__":
    main()
