"""3-D refine study: the API's 3-D route (deployed artifact) with
refine_iterations on the 3-D coarse-noise protocol (same generator + seeds as
`evaluate_hpnn_coarse_noise`'s N-D path: 33-65^3 held-out shapes, unit-peak
shape scoring).

The raw 3-D artifact ladder plateaus just above the round-4 <=8% bar
(v6 9.05% -> v7 8.48% -> v8 8.15%); this study records what the DEPLOYED
route delivers with the CG polish. Writes checkpoints/refine_option_3d.json.

Usage: python scripts/eval_refine_3d.py [--cpu] [--iters 0 4 16]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

if "--cpu" in sys.argv:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    jax.config.update("jax_platforms", "cpu")
    try:
        jax._src.xla_bridge._clear_backends()
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np

from poisson_cnn_tpu.api import PoissonSolver
from poisson_cnn_tpu.data.numerical import _random_coarse_noise_nd
from poisson_cnn_tpu.ops import set_max_magnitude_in_batch
from poisson_cnn_tpu.solvers import poisson_solve_dirichlet

SHAPES = ((49, 49, 49), (33, 65, 49))  # evaluate_hpnn_coarse_noise N-D style
BATCH = 8
N_BATCHES = 4
SEED = 20_000
DX_RANGE = (5e-3, 5e-2)


def batches():
    for i in range(N_BATCHES):
        shape = SHAPES[i % len(SHAPES)]
        k_dx, k_rhs = jax.random.split(jax.random.PRNGKey(SEED + i))
        dx = jax.random.uniform(
            k_dx, (BATCH, 1), minval=DX_RANGE[0], maxval=DX_RANGE[1]
        )
        rhs = _random_coarse_noise_nd(k_rhs, BATCH, shape, (0.5, 1.5))
        soln = poisson_solve_dirichlet(rhs, dx, mode="fd")
        soln = set_max_magnitude_in_batch(soln, 1.0)
        yield rhs, soln, jnp.broadcast_to(dx, (BATCH, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, nargs="+", default=[0, 4, 16])
    args = ap.parse_args()

    out = {
        "protocol": "3-D coarse-noise (33-65^3) through api.PoissonSolver 3-D "
        "route, unit-peak shape scoring",
        "artifact": "checkpoints/hpnn_fast_3d_v7 (the deployed 3-D route)",
        "columns": {},
    }
    for k in args.iters:
        solver = PoissonSolver(refine_iterations=k)
        errs = []
        for rhs, soln, dx in batches():
            pred = solver.solve(rhs, dx)
            pred = set_max_magnitude_in_batch(pred, 1.0)
            num = jnp.sqrt(jnp.sum((pred - soln) ** 2, axis=(1, 2, 3, 4)))
            den = jnp.sqrt(jnp.sum(soln**2, axis=(1, 2, 3, 4)))
            errs.append(np.asarray(num / den))
        e = np.concatenate(errs)
        row = {
            "rel_l2_mean": float(e.mean()),
            "rel_l2_median": float(np.median(e)),
            "rel_l2_p90": float(np.percentile(e, 90)),
            "n": int(e.size),
        }
        out["columns"][f"refine_{k}"] = row
        print(f"refine {k:2d}: mean {row['rel_l2_mean']:.4f} p90 {row['rel_l2_p90']:.4f}")

    with open("/root/repo/checkpoints/refine_option_3d.json", "w") as f:
        json.dump(out, f, indent=2)
    print("saved checkpoints/refine_option_3d.json")


if __name__ == "__main__":
    main()
