"""CLI driver for the Navier–Stokes solvers.

Capability parity with `Navier_Stokes_2D/run_solvers.py`: choose problem
(taylor | driven_cavity), method (alg1 | alg2 | alg3 | gauge), grid size, Re,
dt/steps; run the solver, report errors (Taylor) or field summaries (cavity);
`--error_analysis` runs the grid-refinement convergence study; `--cnn_checkpoint`
plugs a trained Neumann-HPNN into the pressure solve as a CG warm start (the
reference's CNN experiment, `solvers.py:244-267`).

Usage: python -m poisson_cnn_tpu.ns2d.run --problem taylor --method alg1 \
           --grid 64 --steps 100 --dt 2.5e-4
"""

from __future__ import annotations

import argparse
import math

import numpy as np
import jax.numpy as jnp

from . import (
    MACGrid,
    NSConfig,
    cg_pressure_solver,
    cnn_pressure_initializer,
    convergence_rates,
    divergence,
    driven_cavity,
    pressure_error,
    run,
    taylor_vortex,
    velocity_error,
)


def build(args, m):
    if args.problem == "taylor":
        grid = MACGrid(m, m, 0.0, math.pi, 0.0, math.pi)
        problem = taylor_vortex(Re=args.Re)
    else:
        grid = MACGrid(m, m, 0.0, 1.0, 0.0, 1.0)
        problem = driven_cavity(lid_velocity=1.0, y_top=1.0)
    cfg = NSConfig(method=args.method, Re=args.Re, dt=args.dt, n_steps=args.steps)
    pressure_solver = None
    if args.cnn_checkpoint:
        from ..models import HPNN, HPNNConfig
        from ..train.loop import restore_checkpoint
        import jax

        model = HPNN(HPNNConfig(bc_type="neumann"))
        rhs0 = jnp.ones((1, grid.m, grid.n, 1))
        params = model.init(jax.random.PRNGKey(0), rhs0, jnp.full((1, 2), grid.dx))
        params, _ = restore_checkpoint(args.cnn_checkpoint, params)
        init = cnn_pressure_initializer(model, params, grid)
        pressure_solver = cg_pressure_solver(grid, args.cnn_cg_iters, init)
    return grid, problem, cfg, pressure_solver


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--problem", choices=["taylor", "driven_cavity"], default="taylor")
    p.add_argument("--method", choices=["alg1", "alg2", "alg3", "gauge"], default="alg1")
    p.add_argument("--grid", type=int, default=64)
    p.add_argument("--Re", type=float, default=1.0)
    p.add_argument("--dt", type=float, default=2.5e-4)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--error_analysis", action="store_true")
    p.add_argument("--cnn_checkpoint", default=None)
    p.add_argument("--cnn_cg_iters", type=int, default=8)
    args = p.parse_args(argv)

    if args.error_analysis:
        sizes = [args.grid // 4, args.grid // 2, args.grid]
        errs = []
        for m in sizes:
            grid, problem, cfg, ps = build(args, m)
            u, v, pfield = run(grid, problem, cfg, ps)
            t_end = cfg.n_steps * cfg.dt
            e = velocity_error(u, v, grid, problem, t_end)["u"]["l2"]
            errs.append(e)
            print(f"grid {m:4d}: velocity L2 error {e:.3e}")
        print(f"convergence rate: {convergence_rates(sizes, errs):.2f}")
        return

    grid, problem, cfg, ps = build(args, args.grid)
    u, v, pfield = run(grid, problem, cfg, ps)
    t_end = cfg.n_steps * cfg.dt
    div = float(jnp.abs(divergence(u, v, grid)).max())
    print(f"{args.problem}/{args.method} grid={args.grid} steps={args.steps} "
          f"max|div u|={div:.2e}")
    if problem.u_exact is not None:
        verr = velocity_error(u, v, grid, problem, t_end)
        perr = pressure_error(pfield, grid, problem, t_end)
        print(f"velocity error: u l2={verr['u']['l2']:.3e} linf={verr['u']['linf']:.3e}")
        print(f"pressure error: l2={perr['l2']:.3e}")
    else:
        print(f"u range [{float(u.min()):.3f}, {float(u.max()):.3f}], "
              f"v range [{float(v.min()):.3f}, {float(v.max()):.3f}]")


if __name__ == "__main__":
    main()
