"""Train ONE HPNN-Fast checkpoint across the WHOLE reference grid range
(65-513 points per side), so a single artifact demonstrates the reference's
defining variable-grid capability (`poisson_CNN/experiments/hpnn.json:62-77`
trains one model across 192-384^2 variable grids; we cover a wider span).

Three data regimes share one model; shapes are sampled from a mixed snap
lattice (snap-32 below 129, snap-64 above) with aspect ratio capped at 2, each
regime keeping the mode-count / dx ranges of the per-regime round-2 scripts so
the per-bucket eval rows stay comparable with the earlier single-regime
artifacts:

  small  65-129  dx (5e-3, 5e-2)  fourier (1,6)  taylor (2,5)  batch 32
  mid   129-384  dx (5e-3, 5e-2)  fourier (1,8)  taylor (2,6)  batch 16
  xl    385-513  dx (2e-3, 8e-3)  fourier (1,10) taylor (2,6)  batch 8

Eval writes one row per bucket (same shapes/configs as the round-2 per-regime
artifacts) to checkpoints/hpnn_fast_fullrange/eval.json.

Usage: python scripts/train_hpnn_fast_fullrange.py [--steps N] [--eval-only CKPT]
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
)
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.evaluation import evaluate_hpnn, evaluate_hpnn_coarse_noise
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig
from poisson_cnn_tpu.ops import (
    set_max_magnitude_in_batch,
    set_max_magnitude_in_batch_and_return_scaling_factors,
)
from poisson_cnn_tpu.train.loop import save_checkpoint, restore_checkpoint

MODEL = HPNNFastConfig(output_scaling="soln_max_magnitude")

NORM = Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True)


def _regime_cfg(name: str) -> ReverseConfig:
    """Data config for a bucket regime (ranges match the round-2 scripts)."""
    if name == "small":
        return ReverseConfig(
            batch_size=32,
            grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
            fourier_mode_range=(1, 6), taylor_degree_range=(2, 5),
            bc="dirichlet", normalizations=NORM,
        )
    if name == "mid":
        return ReverseConfig(
            batch_size=16,
            grids=GridSamplingConfig(((192, 384), (192, 384)), (5e-3, 5e-2), snap=128),
            fourier_mode_range=(1, 8), taylor_degree_range=(2, 6),
            bc="dirichlet", normalizations=NORM,
        )
    if name == "xl":
        return ReverseConfig(
            batch_size=8,
            grids=GridSamplingConfig(((384, 513), (384, 513)), (2e-3, 8e-3), snap=128),
            fourier_mode_range=(1, 10), taylor_degree_range=(2, 6),
            bc="dirichlet", normalizations=NORM,
        )
    raise ValueError(name)


REGIMES = {name: _regime_cfg(name) for name in ("small", "mid", "xl")}
EVAL_SHAPES = {
    "small": ((97, 97), (65, 129)),
    "mid": ((257, 257), (321, 257)),
    "xl": ((385, 385), (513, 385)),
}

# mixed snap lattice: 32 below 129 (so the 65-97 eval bucket is on-lattice),
# 64 above; aspect ratio capped at 2 to bound the executable count (~47 pairs)
SIZES = [65, 97, 129, 193, 257, 321, 385, 449, 513]


def regime_of(shape):
    m = max(shape)
    return "small" if m <= 129 else ("mid" if m <= 384 else "xl")


def sample_shape(rng: np.random.Generator):
    n0 = int(rng.choice(SIZES))
    partners = [s for s in SIZES if max(s, n0) / min(s, n0) <= 2.0]
    n1 = int(rng.choice(partners))
    return (n0, n1)


def evaluate_all(model, params):
    apply_fn = jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))
    rows = {}
    for name, cfg in REGIMES.items():
        rows[name] = evaluate_hpnn(apply_fn, cfg, grid_shapes=EVAL_SHAPES[name])
    rows["worst_bucket_mean"] = max(r["rel_l2_mean"] for r in rows.values())
    # standard out-of-family column (VERDICT round-2 weak #8): the reference's
    # own coarse-noise training distribution, spectral FD ground truth
    rows["coarse_noise"] = evaluate_hpnn_coarse_noise(apply_fn)
    return rows


def _coarse_cfg(shape) -> NumericalConfig:
    """Coarse-noise numerical data config (the reference's training
    distribution, `poisson_CNN/dataset/generators/numerical.py:10-35`) at the
    bucket regime's batch size, homogeneous Dirichlet BCs."""
    base = REGIMES[regime_of(shape)]
    return NumericalConfig(
        batch_size=base.batch_size,
        grids=base.grids,
        rhs="random",
        nonzero_boundaries=(),
        field_type="coarse_noise",
        solver="spectral",
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=30000)
    p.add_argument("--lr", type=float, default=2e-4)
    p.add_argument("--eval-only", default=None)
    p.add_argument("--continue-from", default=None)
    p.add_argument(
        "--mix-coarse", type=float, default=0.0,
        help="fraction of steps trained on coarse-noise numerical data (the "
        "reference's training distribution) instead of reverse-mode data",
    )
    p.add_argument(
        "--shape-jitter", type=float, default=0.0,
        help="fraction of steps whose sampled 32k+1 shape is decremented to "
        "the exact-multiple 32k lattice: trains the marginless pad regime so "
        "the checkpoint can run with force_pad_margin=False (unpadded "
        "power-of-two grids at full speed; see _pad_to_multiple)",
    )
    p.add_argument(
        "--seed", type=int, default=0,
        help="data-stream seed (shape sampler + PRNG keys). Changing ONLY the "
        "seed keeps the HLO identical, so a continuation run reuses every "
        "cached executable while seeing fresh data",
    )
    p.add_argument(
        "--config-json", default=None,
        help="path to an HPNNFastConfig JSON overriding the default MODEL "
        "(e.g. the bench config so the throughput artifact covers the range)",
    )
    p.add_argument("--out", default="/root/repo/checkpoints/hpnn_fast_fullrange")
    args = p.parse_args()

    global MODEL
    config_json = args.config_json
    if config_json is None:
        # continuation/eval runs must rebuild the checkpoint's own
        # architecture, not the script default (a mismatch aborts on a
        # ScopeParamShapeError / tree-key mismatch at restore time)
        ref_ckpt = args.continue_from or args.eval_only
        if ref_ckpt:
            candidate = os.path.join(
                os.path.dirname(os.path.abspath(ref_ckpt)), "config.json")
            if os.path.exists(candidate):
                config_json = candidate
                print(f"using config from checkpoint dir: {candidate}")
    if config_json:
        with open(config_json) as f:
            d = json.load(f)
        for k in ("scale_filters", "dx_mlp_units"):
            if k in d:
                d[k] = tuple(d[k])
        MODEL = HPNNFastConfig(**d)

    model = HPNNFast(MODEL)
    rng = np.random.default_rng(args.seed)
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
        print(json.dumps(evaluate_all(model, params), indent=2))
        return

    if args.continue_from:
        params, _ = restore_checkpoint(args.continue_from, params)
        params = jax.device_put(params, jax.devices()[0])

    schedule = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, 200, args.steps, args.lr * 0.05
    )
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(schedule))
    opt_state = jax.device_put(tx.init(params), jax.devices()[0])

    step_cache = {}

    def make_step(shape):
        cfg = REGIMES[regime_of(shape)]
        loss_cfg = losses.LossConfig(
            mse_weight=1.0, mae_weight=0.2, integral_weight=0.0,
            global_batch_size=cfg.batch_size,
        )

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_batch(key, cfg, shape)
                pred = model.apply(p, batch["rhs"], batch["dx"])
                return losses.loss_wrapper(
                    loss_cfg, batch["soln"], pred, batch["rhs"], batch["dx"]
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    def make_coarse_step(shape):
        """Train step on coarse-noise numerical data, normalized with the same
        training convention as the reverse-mode batches (rhs -> unit peak
        pair-consistently, then soln -> unit peak)."""
        ncfg = _coarse_cfg(shape)
        loss_cfg = losses.LossConfig(
            mse_weight=1.0, mae_weight=0.2, integral_weight=0.0,
            global_batch_size=ncfg.batch_size,
        )

        @jax.jit
        def step(params, opt_state, key):
            def loss_fn(p):
                batch = generate_numerical_batch(key, ncfg, shape)
                rhs, f = set_max_magnitude_in_batch_and_return_scaling_factors(
                    batch["rhs"], 1.0
                )
                soln = batch["soln"] * f[:, None, None, None]
                soln = set_max_magnitude_in_batch(soln, 1.0)
                pred = model.apply(p, rhs, batch["dx"])
                return losses.loss_wrapper(loss_cfg, soln, pred, rhs, batch["dx"])

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state2, loss

        return step

    coarse_cache = {}
    key = jax.random.PRNGKey(args.seed + 1)
    t0 = time.time()
    running = []
    best_window = [float("inf")]
    best_params = [None]
    os.makedirs(args.out, exist_ok=True)
    for it in range(args.steps):
        shape = sample_shape(rng)
        if args.shape_jitter > 0 and rng.random() < args.shape_jitter:
            shape = tuple(s - 1 for s in shape)  # 32k+1 -> exact multiple
        use_coarse = args.mix_coarse > 0 and rng.random() < args.mix_coarse
        cache, factory = (
            (coarse_cache, make_coarse_step) if use_coarse
            else (step_cache, make_step)
        )
        if shape not in cache:
            print(f"[{it}] compiling {'coarse ' if use_coarse else ''}shape "
                  f"{shape}", flush=True)
            cache[shape] = factory(shape)
        key, sub = jax.random.split(key)
        params, opt_state, loss = cache[shape](params, opt_state, sub)
        running.append(float(loss))
        if (it + 1) % 500 == 0:
            window = float(np.mean(running[-500:]))
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

    if best_params[0] is not None and best_window[0] < float(np.mean(running[-500:])):
        params = jax.device_put(best_params[0], jax.devices()[0])
        print(f"using best-window params (loss {best_window[0]:.5f})", flush=True)
    path = save_checkpoint(args.out, params, args.steps)
    with open(os.path.join(args.out, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(MODEL), f, indent=2)
    metrics = evaluate_all(model, params)
    metrics["final_train_loss"] = float(np.mean(running[-500:]))
    metrics["checkpoint"] = path
    metrics["steps"] = args.steps
    with open(os.path.join(args.out, "eval.json"), "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics, indent=2))


if __name__ == "__main__":
    main()
