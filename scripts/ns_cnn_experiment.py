"""Navier–Stokes pressure-solve experiment: few-iteration CG warm-started by
the trained Neumann HPNN vs zero-started, inside the full projection loop.

This reproduces the reference's headline application experiment
(`Navier_Stokes_2D/solvers.py:244-267`: maxiter=2 BiCGStab from a CNN initial
guess) with our trained checkpoint and measures final velocity error on the
Taylor vortex.

Usage: python scripts/ns_cnn_experiment.py --checkpoint checkpoints/hpnn_neumann/step_20000
"""

import argparse
import json
import math
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

from poisson_cnn_tpu import ns2d
from poisson_cnn_tpu.models import HPNN
from poisson_cnn_tpu.train.loop import restore_checkpoint
import train_hpnn_demo as hdemo
import dataclasses


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--dt", type=float, default=2.5e-4)
    p.add_argument("--cg_iters", type=int, default=4)
    args = p.parse_args()

    grid = ns2d.MACGrid(args.grid, args.grid, 0.0, math.pi, 0.0, math.pi)
    problem = ns2d.taylor_vortex(Re=1.0)

    model_cfg = dataclasses.replace(hdemo.BIG_MODEL, bc_type="neumann")
    model = HPNN(model_cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, args.grid, args.grid, 1)),
        jnp.full((1, 2), grid.dx),
    )
    params, _ = restore_checkpoint(os.path.abspath(args.checkpoint), params)
    init = ns2d.cnn_pressure_initializer(model, params, grid)

    results = {}
    for name, solver in [
        ("exact_dct", None),
        (f"cg{args.cg_iters}_zero", ns2d.cg_pressure_solver(grid, args.cg_iters)),
        (f"cg{args.cg_iters}_cnn", ns2d.cg_pressure_solver(grid, args.cg_iters, init)),
    ]:
        cfg = ns2d.NSConfig(method="alg1", Re=1.0, dt=args.dt, n_steps=args.steps,
                            helmholtz_iterations=80)
        u, v, pfield = ns2d.run(grid, problem, cfg, solver)
        t_end = args.steps * args.dt
        verr = ns2d.velocity_error(u, v, grid, problem, t_end)
        div = float(jnp.abs(ns2d.divergence(u, v, grid)).max())
        results[name] = {"velocity_l2": verr["u"]["l2"], "max_div": div}
        print(f"{name:14s}: velocity L2 err {verr['u']['l2']:.3e}, max|div u| {div:.2e}",
              flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
