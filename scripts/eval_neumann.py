"""Neumann production-parity evals (round-5 VERDICT #8).

Populates the out-of-family (coarse-noise) column for the two Neumann
artifacts — the reference's deployed NS configuration is a Neumann HPNN
(`Navier_Stokes_2D/solvers.py:29-33`) — and drives the production
`api.PoissonSolver(bc_type="neumann")` route end-to-end against the DCT-I
vertex oracle on a physical-amplitude problem.

Writes `coarse_noise_neumann` into each artifact's eval.json and the API
drive result to checkpoints/neumann_api_drive.json.

Usage: python scripts/eval_neumann.py [--cpu]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

p = argparse.ArgumentParser()
p.add_argument("--cpu", action="store_true")
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

from poisson_cnn_tpu.api import PoissonSolver, _load_hpnn_config, _latest_step_dir
from poisson_cnn_tpu.evaluation import evaluate_hpnn_coarse_noise
from poisson_cnn_tpu.models import HPNN
from poisson_cnn_tpu.train.loop import restore_checkpoint

ARTIFACTS = ("hpnn_neumann", "hpnn_neumann_inloop")


def main():
    root = os.path.join(os.path.dirname(__file__), "..")
    for name in ARTIFACTS:
        adir = os.path.abspath(os.path.join(root, "checkpoints", name))
        cfg = _load_hpnn_config(adir)
        model = HPNN(cfg)
        params = model.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)), jnp.full((1, 1), 0.01)
        )
        params, _ = restore_checkpoint(_latest_step_dir(adir), params)
        apply_fn = jax.jit(lambda rhs, dx: model.apply(params, rhs, dx))
        row = evaluate_hpnn_coarse_noise(apply_fn, bc_type="neumann")
        with open(os.path.join(adir, "eval.json")) as f:
            ev = json.load(f)
        ev["coarse_noise_neumann"] = row
        with open(os.path.join(adir, "eval.json"), "w") as f:
            json.dump(ev, f, indent=2)
        print(name, json.dumps(row))

    # production API drive: physical amplitude, compatible coarse-noise RHS
    solver = PoissonSolver(bc_type="neumann")
    rng = np.random.default_rng(0)
    n = 97
    coarse = rng.uniform(-3.0, 3.0, size=(1, 9, 9, 1)).astype(np.float32)
    from poisson_cnn_tpu.ops import resize_align_corners

    rhs = np.asarray(resize_align_corners(jnp.asarray(coarse), (n, n), "bicubic"))
    w = np.ones(n)
    w[0] = w[-1] = 0.5
    W = np.outer(w, w)[None, :, :, None]
    rhs = rhs - (rhs * W).sum() / W.sum()  # solvable subspace
    dx = 0.01
    u = np.array(solver.solve(rhs[0, :, :, 0], dx))
    u_ex = np.array(solver.solve_exact(rhs[0, :, :, 0], dx))
    u -= (u * W[0, :, :, 0]).sum() / W[0].sum()
    u_ex -= (u_ex * W[0, :, :, 0]).sum() / W[0].sum()
    rel = float(np.linalg.norm(u - u_ex) / np.linalg.norm(u_ex))
    out = {
        "protocol": "api.PoissonSolver(bc_type='neumann'): physical-amplitude "
        "homogeneous Neumann solve vs the DCT-I vertex oracle, 97^2 "
        "coarse-noise RHS (zero-mode projected), rel-L2 after mean removal",
        "rel_l2": rel,
        "artifact": solver.hpnn_dir,
    }
    path = os.path.abspath(os.path.join(root, "checkpoints", "neumann_api_drive.json"))
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
