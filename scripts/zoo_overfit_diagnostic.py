"""Overfit-a-single-batch diagnostic for the weak zoo baselines (round-4
VERDICT #4): DBCRNN (41% in-family), MetaHPNN (35%), MetaDBCNN (31%).

Discriminates latent-bug vs undertraining: each model trains on ONE fixed
batch; an expressive, correctly-wired architecture must drive that batch's
rel-L2 to a few percent or below, while a wiring bug (or an architectural
cap, e.g. the reference's 1-D-boundary -> 2-D expansion bottleneck,
`poisson_CNN/models/Dirichlet_BC_RNN.py:7-77`) plateaus high.

Writes checkpoints/zoo/overfit_diagnostic.json with the rel-L2 curve per model.

Usage: python scripts/zoo_overfit_diagnostic.py [--cpu] [--steps N]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
p.add_argument("--steps", type=int, default=2000)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--models", default="dbcrnn,meta_hpnn,meta_dbcnn")
args = p.parse_args()

if args.cpu:
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
import jax

if args.cpu:
    jax.config.update("jax_platforms", "cpu")
    try:
        jax._src.xla_bridge._clear_backends()
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np
import optax

from poisson_cnn_tpu.data import GridSamplingConfig, ReverseConfig, generate_batch
from poisson_cnn_tpu.data import Normalizations
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.models import (
    DBCRNN,
    DBCRNNConfig,
    MetaDBCNN,
    MetaDBCNNConfig,
    MetaHPNN,
    MetaHPNNConfig,
)

GRIDS = GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2), snap=32)
SHAPE = (97, 97)


def rel_l2(pred, soln):
    d = (pred - soln).reshape(pred.shape[0], -1)
    s = soln.reshape(pred.shape[0], -1)
    return float(jnp.mean(jnp.linalg.norm(d, axis=1) / jnp.linalg.norm(s, axis=1)))


def overfit(name, model, batch_inputs, soln, steps, lr):
    params = model.init(jax.random.PRNGKey(0), *batch_inputs)
    tx = optax.chain(optax.clip_by_global_norm(1.0), optax.adam(lr))
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = model.apply(p, *batch_inputs)
            return jnp.mean((pred - soln) ** 2) + 0.2 * jnp.mean(jnp.abs(pred - soln))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    curve = []
    t0 = time.time()
    for it in range(steps):
        params, opt_state, loss = step(params, opt_state)
        if (it + 1) % max(1, steps // 20) == 0 or it == 0:
            pred = model.apply(params, *batch_inputs)
            curve.append({"step": it + 1, "rel_l2": rel_l2(pred, soln),
                          "loss": float(loss)})
            print(f"{name} step {it+1}: rel_l2={curve[-1]['rel_l2']:.4f} "
                  f"({(it+1)/(time.time()-t0):.1f} steps/s)", flush=True)
    return curve


def main():
    results = {}
    key = jax.random.PRNGKey(123)

    if "meta_hpnn" in args.models:
        cfg = ReverseConfig(
            batch_size=4, grids=GRIDS, fourier_mode_range=(1, 6),
            taylor_degree_range=(2, 5), bc="dirichlet",
            normalizations=Normalizations(rhs_max_magnitude=1.0,
                                          soln_max_magnitude=True),
        )
        b = generate_batch(key, cfg, SHAPE)
        results["meta_hpnn"] = overfit(
            "meta_hpnn", MetaHPNN(MetaHPNNConfig()),
            (b["rhs"], b["dx"]), b["soln"], args.steps, args.lr,
        )

    bcfg = NumericalConfig(
        batch_size=4, grids=GRIDS, rhs="zero", nonzero_boundaries=("left",),
        boundary_mode_range=(2, 6), magnitude_range=(1.0, 1.0),
    )
    bb = generate_numerical_batch(key, bcfg, SHAPE)
    for name, ctor in (("dbcrnn", lambda: DBCRNN(DBCRNNConfig())),
                       ("meta_dbcnn", lambda: MetaDBCNN(MetaDBCNNConfig()))):
        if name in args.models:
            results[name] = overfit(
                name, ctor(),
                (bb["boundaries"]["left"], bb["dx"], SHAPE[0]),
                bb["soln"], args.steps, args.lr,
            )

    out = "/root/repo/checkpoints/zoo/overfit_diagnostic.json"
    with open(out, "w") as f:
        json.dump({"protocol": "one fixed batch (B=4, 97^2), adam lr "
                   f"{args.lr}, {args.steps} steps", "curves": results}, f,
                  indent=2)
    print(json.dumps({k: v[-1] for k, v in results.items()}, indent=2))


if __name__ == "__main__":
    main()
