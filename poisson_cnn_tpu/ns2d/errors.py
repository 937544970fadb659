"""Error norms and grid-convergence analysis against exact solutions.

Capability parity with the reference's `Error` class
(`Navier_Stokes_2D/solvers.py:1229-1303`) and the `error_analysis` convergence
study in `run_solvers.py` — L1/L2/Linf velocity and pressure errors vs the
analytic Taylor-vortex fields, and fitted convergence rates.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax.numpy as jnp

from .mesh import MACGrid, Problem


def _norms(err: jnp.ndarray) -> Dict[str, float]:
    e = np.asarray(err)
    return {
        "l1": float(np.mean(np.abs(e))),
        "l2": float(np.sqrt(np.mean(e**2))),
        "linf": float(np.abs(e).max()),
    }


def velocity_error(u, v, grid: MACGrid, problem: Problem, t: float):
    xu, yu = grid.xu, grid.yu
    xv, yv = grid.xv, grid.yv
    ue = problem.u_exact(jnp.asarray(xu)[:, None], jnp.asarray(yu)[None, :], t)
    ve = problem.v_exact(jnp.asarray(xv)[:, None], jnp.asarray(yv)[None, :], t)
    return {"u": _norms(u - ue), "v": _norms(v - ve)}


def pressure_error(p, grid: MACGrid, problem: Problem, t: float):
    xp, yp = grid.xp, grid.yp
    pe = problem.p_exact(jnp.asarray(xp)[:, None], jnp.asarray(yp)[None, :], t)
    # pressure defined up to a constant: compare zero-mean fields
    return _norms((p - jnp.mean(p)) - (pe - jnp.mean(pe)))


def convergence_rates(grid_sizes, errors):
    """Fitted log-log slope of error vs h (reference error_analysis)."""
    log_h = np.log(1.0 / np.asarray(grid_sizes, dtype=float))
    log_e = np.log(np.asarray(errors, dtype=float))
    return float(np.polyfit(log_h, log_e, 1)[0])  # e ~ C h^p -> slope = p
