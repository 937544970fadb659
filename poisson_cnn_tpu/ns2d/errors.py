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


def pressure_gradient_error(p, grid: MACGrid, problem: Problem, t: float):
    """L1/L2/Linf error of the discrete pressure gradient at interior faces vs
    the analytic gradient (reference `Error.pressure_gradient_error`,
    `solvers.py:1283-1303`). Uses centered differences of the exact pressure
    at face positions as the target."""
    import jax.numpy as jnp

    gx = (p[1:, :] - p[:-1, :]) / grid.dx  # interior x-faces (m-1, n)
    gy = (p[:, 1:] - p[:, :-1]) / grid.dy  # interior y-faces (m, n-1)
    xu = jnp.asarray(grid.xu)[1:-1][:, None]
    yu = jnp.asarray(grid.yu)[None, :]
    xv = jnp.asarray(grid.xv)[:, None]
    yv = jnp.asarray(grid.yv)[1:-1][None, :]
    eps = 1e-5
    pex = problem.p_exact
    gpx_exact = (pex(xu + eps, yu, t) - pex(xu - eps, yu, t)) / (2 * eps)
    gpy_exact = (pex(xv, yv + eps, t) - pex(xv, yv - eps, t)) / (2 * eps)
    return {"gx": _norms(gx - gpx_exact), "gy": _norms(gy - gpy_exact)}


def integrate_centered(field, grid: MACGrid, method: str = "riemann") -> float:
    """Integral of a cell-centered field over the domain (reference
    `mesh.integrate`, `structure.py:91-115`: Riemann or Simpson weights; used
    for the pressure zero-integral constraint)."""
    f = np.asarray(field)
    if method == "riemann":
        return float(f.sum() * grid.dx * grid.dy)
    if method == "simpson":
        def w(n):
            # composite Simpson needs an odd point count; even counts get a
            # trapezoid patch on the last interval
            if n % 2 == 1:
                v = np.ones(n)
                v[1:-1:2] = 4.0
                v[2:-1:2] = 2.0
                return v / 3.0
            v = np.zeros(n)
            v[: n - 1] = w(n - 1)
            v[n - 2] += 0.5
            v[n - 1] += 0.5
            return v
        wx, wy = w(f.shape[0]), w(f.shape[1])
        return float((wx[:, None] * wy[None, :] * f).sum() * grid.dx * grid.dy)
    raise ValueError(f"unknown method {method}")
