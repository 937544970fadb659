"""Re-score every shipped HPNN-family artifact on the OUT-OF-FAMILY protocol
(round-3 VERDICT #9: the coarse-noise column becomes standard for every
artifact, not just the PCNN).

Protocol: `evaluation.evaluate_hpnn_coarse_noise` — random uniform noise on a
coarse control grid, bicubic supersampled (the reference's own training
distribution, `poisson_CNN/dataset/generators/numerical.py:10-35` capability),
homogeneous Dirichlet, spectral FD ground truth — evaluated at each artifact's
own grid regime. In-family numbers live in each artifact's eval.json; this
writes the second column to checkpoints/coarse_noise_rescore.json and is the
source for PARITY.md's out-of-family column.

Usage: python scripts/rescore_artifacts.py [--only name ...]
"""

import argparse
import json
import os
import sys

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

from poisson_cnn_tpu.evaluation import (
    evaluate_hpnn_coarse_noise,
    evaluate_hpnn_gaussian_mg,
)
from poisson_cnn_tpu.models import HPNN, HPNNConfig
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, load_fast_config
from poisson_cnn_tpu.train.loop import restore_checkpoint

CKPT = "/root/repo/checkpoints"

# regimes: grid shapes + dx range + control-grid range for the noise fields
REGIMES = {
    "small": dict(grid_shapes=((97, 97), (65, 129)), dx_range=(5e-3, 5e-2)),
    "mid": dict(grid_shapes=((257, 257), (321, 257)), dx_range=(5e-3, 5e-2),
                batch_size=16),
    "xl": dict(grid_shapes=((385, 385), (513, 385)), dx_range=(2e-3, 8e-3),
               batch_size=8),
}


def fast(name, step, regime):
    def build():
        cfg = load_fast_config(os.path.join(CKPT, name, "config.json"))
        model = HPNNFast(cfg)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = model.init(
                jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)),
                jnp.full((1, 1), 0.01),
            )
        params, _ = restore_checkpoint(os.path.join(CKPT, name, step), params)
        params = jax.device_put(params, jax.devices()[0])
        return jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))

    return build, regime


def hpnn_from_config(name, step, regime):
    def build():
        with open(os.path.join(CKPT, name, "config.json")) as f:
            d = json.load(f)["model"]
        for k, v in list(d.items()):
            if isinstance(v, list):
                d[k] = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        model = HPNN(HPNNConfig(**d))
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            # init at a grid large enough that the branch-scale gate keeps
            # EVERY bottleneck branch (the big-ds branches are skipped below
            # 2*ds, so a 97^2 init materializes fewer params than the
            # 257-regime checkpoints carry)
            params = model.init(
                jax.random.PRNGKey(0), jnp.ones((1, 321, 321, 1)),
                jnp.full((1, 1), 0.01),
            )
        params, _ = restore_checkpoint(os.path.join(CKPT, name, step), params)
        params = jax.device_put(params, jax.devices()[0])
        return jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))

    return build, regime


def hpnn_demo_big(step="step_25000", regime="small"):
    def build():
        import train_hpnn_demo as hdemo

        model = HPNN(hdemo.BIG_MODEL)
        cpu = jax.devices("cpu")[0]
        with jax.default_device(cpu):
            params = model.init(
                jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)),
                jnp.full((1, 1), 0.01),
            )
        params, _ = restore_checkpoint(
            os.path.join(CKPT, "hpnn_demo_big", step), params
        )
        params = jax.device_put(params, jax.devices()[0])
        return jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))

    return build, regime


ARTIFACTS = {
    "hpnn_fast": fast("hpnn_fast", "step_12000", "small"),  # bench config (r=8, fullrange-trained)
    "hpnn_fast_v3": fast("hpnn_fast_v3", "step_12000", "small"),  # + 50% coarse mix
    "hpnn_fast_v3@mid": fast("hpnn_fast_v3", "step_12000", "mid"),
    "hpnn_fast_v3@xl": fast("hpnn_fast_v3", "step_12000", "xl"),
    "hpnn_fast_r2": fast("hpnn_fast_r2", "step_12000", "small"),
    "hpnn_fast_256": fast("hpnn_fast_256", "step_10000", "mid"),
    "hpnn_fast_512": fast("hpnn_fast_512", "step_8000", "xl"),
    "hpnn_fast_fullrange": fast("hpnn_fast_fullrange", "step_30000", "small"),
    "hpnn_fast_fullrange@mid": fast("hpnn_fast_fullrange", "step_30000", "mid"),
    "hpnn_fast_fullrange_v2@mid": fast("hpnn_fast_fullrange_v2", "step_12000", "mid"),
    "hpnn_fast_fullrange_v2@xl": fast("hpnn_fast_fullrange_v2", "step_12000", "xl"),
    "hpnn_demo_big": hpnn_demo_big(),
    "hpnn_flagship": hpnn_from_config("hpnn_flagship", "step_8000", "mid"),
    "hpnn_refgrid_big": hpnn_from_config("hpnn_refgrid_big", "step_4000", "mid"),
}


COLUMNS = {
    # second column: coarse-control-grid noise RHS, spectral FD ground truth
    "coarse_noise": (evaluate_hpnn_coarse_noise, "coarse_noise_rescore.json"),
    # third column (round-3 VERDICT #9): Gaussian-bump RHS, host C++ MG truth
    "gaussian_mg": (evaluate_hpnn_gaussian_mg, "gaussian_mg_rescore.json"),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", nargs="*", default=None)
    ap.add_argument("--column", choices=sorted(COLUMNS), default="coarse_noise")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    eval_fn, default_out = COLUMNS[args.column]
    out_path = args.out or os.path.join(CKPT, default_out)
    out = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            out = json.load(f)
    for name, (build, regime) in ARTIFACTS.items():
        if args.only and name not in args.only:
            continue
        apply_fn = build()
        kw = dict(REGIMES[regime])
        out[name] = {"regime": regime, **eval_fn(apply_fn, **kw)}
        print(name, json.dumps(out[name]), flush=True)
        with open(out_path, "w") as f:
            json.dump(out, f, indent=2)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
