"""Evaluate an HPNN-Fast checkpoint in the MARGINLESS pad regime.

The round-4 pad-margin fix (checkpoints/even_grid_fix.json) showed checkpoints
trained only on 32k+1 lattices collapse on exact-multiple grids unless the
input is padded up a full extra block (~27% overhead at 256^2). Jitter-trained
checkpoints (scripts/train_hpnn_fast_fullrange.py --shape-jitter) see both pad
regimes during training; this script verifies that claim: it scores a
checkpoint with force_pad_margin=False on exact-multiple grids (the unpadded
fast path the bench runs) AND on the standard odd shapes, in-family +
coarse-noise. The bench config may only be wired marginless if the even-grid
columns match the odd-grid ones.

Usage: python scripts/eval_marginless.py CKPT_DIR [--out OUT.json]
"""

import argparse
import dataclasses
import json
import os
import sys

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

from poisson_cnn_tpu.data import (
    GridSamplingConfig,
    Normalizations,
    ReverseConfig,
)
from poisson_cnn_tpu.evaluation import evaluate_hpnn, evaluate_hpnn_coarse_noise
from poisson_cnn_tpu.models.hpnn_fast import HPNNFast, HPNNFastConfig
from poisson_cnn_tpu.train.loop import restore_checkpoint

NORM = Normalizations(rhs_max_magnitude=1.0, soln_max_magnitude=True)

# even (exact-multiple-of-r*2^scales) vs odd (reference-style 32k+1) shapes,
# same size regimes as scripts/train_hpnn_fast_fullrange.py EVAL_SHAPES
SHAPE_SETS = {
    "even_small": ((96, 96), (64, 128)),
    "even_mid": ((256, 256), (320, 256)),
    "even_xl": ((384, 384), (512, 384)),
    "odd_small": ((97, 97), (65, 129)),
    "odd_mid": ((257, 257), (321, 257)),
    "odd_xl": ((385, 385), (513, 385)),
}


def _cfg_for(name: str) -> ReverseConfig:
    regime = name.split("_")[1]
    if regime == "small":
        return ReverseConfig(
            batch_size=32,
            grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
            fourier_mode_range=(1, 6), taylor_degree_range=(2, 5),
            bc="dirichlet", normalizations=NORM,
        )
    if regime == "mid":
        return ReverseConfig(
            batch_size=16,
            grids=GridSamplingConfig(((192, 384), (192, 384)), (5e-3, 5e-2), snap=128),
            fourier_mode_range=(1, 8), taylor_degree_range=(2, 6),
            bc="dirichlet", normalizations=NORM,
        )
    return ReverseConfig(
        batch_size=8,
        grids=GridSamplingConfig(((384, 513), (384, 513)), (2e-3, 8e-3), snap=128),
        fourier_mode_range=(1, 10), taylor_degree_range=(2, 6),
        bc="dirichlet", normalizations=NORM,
    )


def main():
    p = argparse.ArgumentParser()
    p.add_argument("ckpt_dir")
    p.add_argument("--out", default=None)
    p.add_argument(
        "--step", type=int, default=None,
        help="evaluate a specific saved step instead of the latest (p90-aware "
        "checkpoint selection sweeps every saved step and gates on mean AND "
        "p90, round-4 VERDICT #6)",
    )
    args = p.parse_args()

    with open(os.path.join(args.ckpt_dir, "config.json")) as f:
        d = json.load(f)
    for k in ("scale_filters", "dx_mlp_units"):
        if k in d:
            d[k] = tuple(d[k])
    d["force_pad_margin"] = False  # the regime under test
    model = HPNNFast(HPNNFastConfig(**d))

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 33, 33, 1)), jnp.full((1, 2), 0.01)
        )
    steps = sorted(
        int(q.split("_")[1]) for q in os.listdir(args.ckpt_dir) if q.startswith("step_")
    )
    step = args.step if args.step is not None else steps[-1]
    if step not in steps:
        raise SystemExit(f"step {step} not in saved checkpoints {steps}")
    params, _ = restore_checkpoint(
        os.path.join(args.ckpt_dir, f"step_{step}"), params
    )
    params = jax.device_put(params, jax.devices()[0])
    apply_fn = jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))

    rows = {"ckpt": args.ckpt_dir, "step": step, "force_pad_margin": False}
    for name, shapes in SHAPE_SETS.items():
        rows[name] = evaluate_hpnn(apply_fn, _cfg_for(name), grid_shapes=shapes)
        print(f"{name}: {rows[name]['rel_l2_mean']:.4f}", flush=True)
    rows["coarse_noise_even"] = evaluate_hpnn_coarse_noise(
        apply_fn, grid_shapes=((96, 96), (64, 128))
    )
    rows["coarse_noise_odd"] = evaluate_hpnn_coarse_noise(apply_fn)
    print(json.dumps(rows, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)


if __name__ == "__main__":
    main()
