"""Score the API `refine_iterations` option on the out-of-family coarse-noise
protocol (round-5: the p90 tail is rough-rhs high-frequency error the CNN
cannot represent; k anchor-started CG sweeps collapse it).

Protocol identical to `evaluation.evaluate_hpnn_coarse_noise` (same seeds,
grids 97^2 / 65x129, unit-peak shape scoring) but driven through the
PRODUCTION `api.PoissonSolver` homogeneous route so the measured thing is the
deployed path: peak-normalize -> HPNN-Fast -> coarse-anchor amplitude ->
k-sweep CG residual correction -> re-peak for scoring.

Also times the refined route vs the raw route at the bench shape (256^2,
batch 128) when run on the TPU chip, so the accuracy gain has a cost number.

Writes checkpoints/refine_option.json.

Usage: python scripts/eval_refine.py [--cpu] [--iters 0 2 4 8 16] [--no-timing]
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
from poisson_cnn_tpu.data import GridSamplingConfig
from poisson_cnn_tpu.data.numerical import NumericalConfig, generate_numerical_batch
from poisson_cnn_tpu.ops import (
    set_max_magnitude_in_batch,
    set_max_magnitude_in_batch_and_return_scaling_factors,
)


def protocol_batches():
    cfg = NumericalConfig(
        batch_size=32,
        grids=GridSamplingConfig(((64, 128), (64, 128)), (5e-3, 5e-2)),
        rhs="random",
        nonzero_boundaries=(),
        field_type="coarse_noise",
        solver="spectral",
    )
    for i in range(4):
        shape = ((97, 97), (65, 129))[i % 2]
        batch = generate_numerical_batch(jax.random.PRNGKey(20_000 + i), cfg, shape)
        rhs, soln, dx = batch["rhs"], batch["soln"], batch["dx"]
        rhs, f = set_max_magnitude_in_batch_and_return_scaling_factors(rhs, 1.0)
        soln = soln * f.reshape((-1, 1, 1, 1))
        soln = set_max_magnitude_in_batch(soln, 1.0)
        yield rhs, soln, dx


def score(solver: PoissonSolver):
    errs = []
    for rhs, soln, dx in protocol_batches():
        pred = solver.solve(rhs, dx)
        pred = set_max_magnitude_in_batch(pred, 1.0)  # unit-peak shape scoring
        num = jnp.sqrt(jnp.sum((pred - soln) ** 2, axis=(1, 2, 3)))
        den = jnp.sqrt(jnp.sum(soln**2, axis=(1, 2, 3)))
        errs.append(np.asarray(num / den))
    e = np.concatenate(errs)
    return {
        "rel_l2_mean": float(e.mean()),
        "rel_l2_median": float(np.median(e)),
        "rel_l2_p90": float(np.percentile(e, 90)),
        "n": int(e.size),
    }


def time_route(solver: PoissonSolver, n=256, batch=128, iters=64, repeats=3):
    """Median wall-time per solve() call at the bench shape (one compile, then
    timed repeats of `iters` chained calls)."""
    import time

    rhs = jax.random.normal(jax.random.PRNGKey(0), (batch, n, n, 1), jnp.float32)
    dx = jnp.full((batch, 2), 2.0 / (n - 1), jnp.float32)
    u = solver.solve(rhs, dx)
    u.block_until_ready()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            u = solver.solve(rhs, dx)
        u.block_until_ready()
        times.append((time.perf_counter() - t0) / iters)
    return float(np.median(times))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--iters", type=int, nargs="+", default=[0, 2, 4, 8, 16])
    ap.add_argument("--no-timing", action="store_true")
    args = ap.parse_args()

    out = {
        "protocol": "evaluate_hpnn_coarse_noise seeds/shapes through api.PoissonSolver "
        "(production route), unit-peak shape scoring",
        "artifact": "checkpoints/hpnn_fast",
        "columns": {},
    }
    for k in args.iters:
        solver = PoissonSolver(refine_iterations=k)
        row = score(solver)
        if not args.no_timing and not args.cpu:
            row["ms_per_batch128_256"] = round(time_route(solver) * 1e3, 3)
        out["columns"][f"refine_{k}"] = row
        print(f"refine {k:2d}: mean {row['rel_l2_mean']:.4f} "
              f"p90 {row['rel_l2_p90']:.4f}"
              + (f"  {row.get('ms_per_batch128_256','-')} ms/call"
                 if "ms_per_batch128_256" in row else ""))

    with open("/root/repo/checkpoints/refine_option.json", "w") as f:
        json.dump(out, f, indent=2)
    print("saved checkpoints/refine_option.json")


if __name__ == "__main__":
    main()
