"""Evaluate the combined PCNN built from the two independently trained demo
checkpoints (HPNN + DBCNN) on full problems: random RHS + four nonzero
Dirichlet boundaries, ground truth from the spectral solver.

This is the reference's superposition inference path
(`poisson_CNN/models/Poisson_CNN_Legacy.py`) with trained components.

Usage: python scripts/pcnn_combined_eval.py \
    --hpnn checkpoints/hpnn_demo_big/step_25000 \
    --dbcnn checkpoints/dbcnn_demo/step_15000 [--jacobi 10]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

if os.environ.get("CNN_SOLVE_CPU"):
    jax.config.update("jax_platforms", "cpu")
    try:
        jax._src.xla_bridge._clear_backends()
    except Exception:
        pass
import jax.numpy as jnp
import numpy as np

from poisson_cnn_tpu.data import GridSamplingConfig
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.models import DBCNN, DBCNNFast, DBCNNFastConfig, HPNN, HPNNFast, PCNN, PCNNConfig
from poisson_cnn_tpu.models.hpnn_fast import load_fast_config
from poisson_cnn_tpu.train.loop import restore_checkpoint
import train_hpnn_demo as hdemo
import train_dbcnn_demo as ddemo


def build_fast(hpnn_step, dbcnn_step, jacobi, scale_mode="match_peak_laplacian"):
    """Compose the fast family: hpnn/dbcnn args point to step dirs whose
    parent holds config.json."""
    hdir, ddir = os.path.dirname(hpnn_step), os.path.dirname(dbcnn_step)
    hcfg = load_fast_config(os.path.join(hdir, "config.json"))
    with open(os.path.join(ddir, "config.json")) as f:
        d = json.load(f)
    for k in ("scale_filters", "cond_mlp_units"):
        if k in d and isinstance(d[k], list):
            d[k] = tuple(d[k])
    dcfg = DBCNNFastConfig(**d)
    cfg = PCNNConfig(
        hpnn_fast=hcfg, dbcnn_fast=dcfg,
        hpnn_scale_mode=scale_mode, jacobi_iterations=jacobi,
    )
    hpnn_params = HPNNFast(hcfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)), jnp.full((1, 1), 0.01)
    )
    hpnn_params, _ = restore_checkpoint(os.path.abspath(hpnn_step), hpnn_params)
    dbcnn_params = DBCNNFast(dcfg).init(
        jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97
    )
    dbcnn_params, _ = restore_checkpoint(os.path.abspath(dbcnn_step), dbcnn_params)
    params = {
        "params": {
            "HPNNFast_0": hpnn_params["params"],
            "DBCNNFast_0": dbcnn_params["params"],
        }
    }
    return PCNN(cfg), params


def build_legacy(hpnn_step, dbcnn_step, jacobi):
    cfg = PCNNConfig(
        hpnn=hdemo.BIG_MODEL,
        dbcnn=ddemo.MODEL,
        hpnn_scale_mode="match_peak_laplacian",
        jacobi_iterations=jacobi,
    )
    hpnn_params = HPNN(hdemo.BIG_MODEL).init(
        jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)), jnp.full((1, 1), 0.01)
    )
    hpnn_params, _ = restore_checkpoint(os.path.abspath(hpnn_step), hpnn_params)
    dbcnn_params = DBCNN(ddemo.MODEL).init(
        jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97
    )
    dbcnn_params, _ = restore_checkpoint(os.path.abspath(dbcnn_step), dbcnn_params)
    params = {
        "params": {
            "HPNN_0": hpnn_params["params"],
            "DBCNN_0": dbcnn_params["params"],
        }
    }
    return PCNN(cfg), params


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--hpnn", required=True)
    p.add_argument("--dbcnn", required=True)
    p.add_argument("--fast", action="store_true",
                   help="compose HPNNFast + DBCNNFast checkpoints instead of "
                   "the reference-parity HPNN + DBCNN demos")
    p.add_argument("--jacobi", type=int, default=0)
    p.add_argument("--scale-mode", default="match_peak_laplacian",
                   choices=("domain", "match_peak_laplacian", "match_laplacian_l2", "coarse_anchor"))
    p.add_argument("--batches", type=int, default=4)
    p.add_argument("--field-types", default="series,coarse_noise")
    args = p.parse_args()

    model, params = (
        build_fast(args.hpnn, args.dbcnn, args.jacobi, args.scale_mode) if args.fast
        else build_legacy(args.hpnn, args.dbcnn, args.jacobi)
    )

    out = {"jacobi_iterations": args.jacobi, "fast": bool(args.fast)}
    for ft in args.field_types.split(","):
        data_cfg = NumericalConfig(
            batch_size=16,
            grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32),
            rhs="random",
            nonzero_boundaries=("left", "right", "top", "bottom"),
            boundary_mode_range=(2, 6),
            rhs_mode_range=(1, 6),
            field_type=ft,
        )
        errs = []
        for i in range(args.batches):
            shape = (97, 97) if i % 2 == 0 else (65, 97)
            batch = generate_numerical_batch(
                jax.random.PRNGKey(30_000 + i), data_cfg, shape
            )
            b = batch["boundaries"]
            pred = model.apply(
                params, batch["rhs"], b["left"], b["top"], b["right"], b["bottom"],
                batch["dx"],
            )
            soln = batch["soln"]
            d = (pred - soln).reshape(pred.shape[0], -1)
            s = soln.reshape(soln.shape[0], -1)
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
    print(json.dumps(out))


if __name__ == "__main__":
    main()
