"""Harvest the NS projection loop's own pressure-Poisson problems as a
training set for the in-loop CNN solver (round-3 VERDICT item #1).

Round 2's honest negative result (`checkpoints/ns_cnn_results.json`) showed the
Neumann HPNN predicts in-loop pressure fields no better than zero
(`cnn_field_rel_l2` ~ 1.0): it was trained on truncated-series reverse data and
never saw the loop's distribution (divergence-of-intermediate-velocity fields,
peak ~0.04 after the initial transient). The plumbing to fix that exists —
`ns2d.run(..., return_aux=True)` returns every pressure RHS the loop produced
(`poisson_cnn_tpu/ns2d/stepper.py` aux hook). This script runs the two
reference problems (Taylor vortex + lid-driven cavity,
`/root/reference/Navier_Stokes_2D/solvers.py:244-267` is the reference's CNN
hook) across several grids/parameters, solves each harvested RHS exactly with
the DCT Neumann solver, and writes (rhs, soln, dx) pairs:

  checkpoints/ns_inloop_data/train_g{n}.npz   (parameter set A)
  checkpoints/ns_inloop_data/eval_g{n}.npz    (held-out parameter set B)

Solutions are zero-mean (the Neumann gauge the DCT solver and the reverse
Neumann generator both use). Runs on CPU (fp32 matmul precision 'highest'):
the DCT solve inside the loop is precision-critical.
"""

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=1"
).strip()
import jax

jax.config.update("jax_platforms", "cpu")
try:
    jax._src.xla_bridge._clear_backends()
except Exception:
    pass
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import numpy as np

from poisson_cnn_tpu import ns2d

# (name, problem factory, Re, dt, n_steps, stride)
TRAIN_RUNS = [
    ("taylor", lambda: ns2d.taylor_vortex(Re=1.0), 1.0, 2.5e-4, 240, 2),
    ("cavity", lambda: ns2d.driven_cavity(lid_velocity=1.0, y_top=math.pi), 100.0,
     2.5e-4, 240, 2),
    ("cavity_re500", lambda: ns2d.driven_cavity(lid_velocity=1.0, y_top=math.pi),
     500.0, 2.5e-4, 240, 2),
]
EVAL_RUNS = [
    ("taylor_re05", lambda: ns2d.taylor_vortex(Re=0.5), 0.5, 2e-4, 120, 3),
    ("cavity_lid07", lambda: ns2d.driven_cavity(lid_velocity=0.7, y_top=math.pi),
     50.0, 2e-4, 120, 3),
]


def harvest(runs, grid_n):
    grid = ns2d.MACGrid(grid_n, grid_n, 0.0, math.pi, 0.0, math.pi)
    solve = ns2d.dct_pressure_solver(grid)
    rhs_list, soln_list = [], []
    for name, factory, Re, dt, n_steps, stride in runs:
        cfg = ns2d.NSConfig(method="alg1", Re=Re, dt=dt, n_steps=n_steps,
                            helmholtz_iterations=80)
        u, v, p, aux = ns2d.run(grid, factory(), cfg, return_aux=True)
        assert bool(jnp.isfinite(u).all()), f"{name} g{grid_n} diverged"
        rhs_all = np.asarray(aux["pressure_rhs"])[::stride]
        for rhs in rhs_all:
            phi = solve(jnp.asarray(rhs))
            phi = phi - jnp.mean(phi)
            rhs_list.append(rhs)
            soln_list.append(np.asarray(phi))
        print(f"{name} g{grid_n}: {len(rhs_all)} snapshots "
              f"(peak range {np.abs(rhs_all).max(axis=(1,2)).min():.3g}.."
              f"{np.abs(rhs_all).max(axis=(1,2)).max():.3g})", flush=True)
    return (np.stack(rhs_list), np.stack(soln_list),
            np.array([grid.dx, grid.dy], dtype=np.float32))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grids", type=int, nargs="+", default=[64, 100, 128])
    ap.add_argument("--out", default="/root/repo/checkpoints/ns_inloop_data")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    for n in args.grids:
        for split, runs in (("train", TRAIN_RUNS), ("eval", EVAL_RUNS)):
            rhs, soln, dx = harvest(runs, n)
            path = os.path.join(args.out, f"{split}_g{n}.npz")
            np.savez_compressed(path, rhs=rhs, soln=soln, dx=dx)
            print(f"wrote {path}: rhs {rhs.shape}", flush=True)


if __name__ == "__main__":
    main()
