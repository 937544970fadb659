"""CNN-accelerated Poisson solving: trained HPNN as the initial guess for CG.

The reference's headline application experiment runs a 2-iteration BiCGStab
from a CNN-predicted start inside the Navier-Stokes pressure solve
(`Navier_Stokes_2D/solvers.py:244-267`). This script quantifies the same
effect on Dirichlet Poisson problems: residual decay of CG from a zero start
vs from the trained HPNN's prediction.

Usage: python scripts/cnn_accelerated_solve.py --checkpoint checkpoints/hpnn_demo/step_12000 [--big]
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

from poisson_cnn_tpu import solvers
from poisson_cnn_tpu.data import generate_batch
from poisson_cnn_tpu.models import HPNN
from poisson_cnn_tpu.train.loop import restore_checkpoint
import train_hpnn_demo as demo


def residual_norm(u, rhs, dx):
    r = rhs - solvers.laplacian_dirichlet(u, dx)
    return jnp.linalg.norm(r[:, 1:-1, 1:-1, :].reshape(u.shape[0], -1), axis=1)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--big", action="store_true")
    p.add_argument("--iters", type=int, nargs="+", default=[0, 5, 10, 20, 40])
    args = p.parse_args()

    model = HPNN(demo.BIG_MODEL if args.big else demo.MODEL)
    shape = (97, 97)
    batch = generate_batch(jax.random.PRNGKey(777), demo.DATA, shape)
    rhs, soln, dx = batch["rhs"], batch["soln"], batch["dx"]
    dx2 = jnp.broadcast_to(dx, (rhs.shape[0], 2))

    params = model.init(jax.random.PRNGKey(0), rhs[:1], dx[:1])
    params, _ = restore_checkpoint(os.path.abspath(args.checkpoint), params)

    # NOTE on scales: the demo data normalizes solutions to unit peak; CG needs
    # the *physical* pair, so rescale rhs consistently. lap(soln_norm) =
    # rhs / peak(soln_physical); we simply solve lap(u) = lap(soln_norm) so the
    # CNN prediction and the CG target live on the same scale.
    rhs_cg = jnp.pad(
        solvers.laplacian_dirichlet(soln, dx2)[:, 1:-1, 1:-1, :],
        ((0, 0), (1, 1), (1, 1), (0, 0)),
    )

    pred = model.apply(params, rhs, dx)

    def rel_err(u):
        # solution-error norm: the quantity the CNN initializer improves (its
        # prediction is smooth-mode accurate; residual norms are dominated by
        # 1/dx^2-amplified high frequencies and mislead here)
        d = (u - soln).reshape(u.shape[0], -1)
        s = soln.reshape(u.shape[0], -1)
        return jnp.linalg.norm(d, axis=1) / jnp.linalg.norm(s, axis=1)

    out = {"iters": [], "zero_init": [], "cnn_init": []}
    for k in args.iters:
        if k == 0:
            ez = rel_err(jnp.zeros_like(soln))
            ec = rel_err(pred)
        else:
            uz = solvers.conjugate_gradient(rhs_cg, dx2, n_iterations=k)
            uc = solvers.conjugate_gradient(rhs_cg, dx2, n_iterations=k, x0=pred)
            ez, ec = rel_err(uz), rel_err(uc)
        out["iters"].append(k)
        out["zero_init"].append(float(jnp.mean(ez)))
        out["cnn_init"].append(float(jnp.mean(ec)))
        print(
            f"CG iters {k:3d}: mean rel-L2 error zero-init {out['zero_init'][-1]:.3e} "
            f"cnn-init {out['cnn_init'][-1]:.3e}",
            flush=True,
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
