"""Navier-Stokes CNN-in-the-loop experiment, quantified and committed.

Reproduces the reference's headline application experiment
(`Navier_Stokes_2D/solvers.py:244-267`: few-iteration BiCGStab warm-started by
a trained HPNN inside the projection loop) with two measurements:

1. In-loop equal-budget table (Taylor vortex + lid-driven cavity at --grid^2):
   exact DCT solve vs k-iteration CG from zero vs k-iteration CG from the CNN
   prediction — final velocity error (Taylor has an exact solution) and
   max |div u| (both problems).
2. Iteration-savings table: collect the actual pressure-Poisson RHS fields the
   loop produces (via `ns2d.run(..., return_aux=True)`), then measure CG
   iterations to fixed relative residual from zero vs from the CNN guess.

Writes JSON to checkpoints/ns_cnn_results.json (committed, like the PCNN eval).

Usage: python scripts/ns_cnn_experiment.py --checkpoint checkpoints/hpnn_neumann/step_12000
"""

import argparse
import dataclasses
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
import numpy as np

from poisson_cnn_tpu import ns2d
from poisson_cnn_tpu.models import HPNN
from poisson_cnn_tpu.train.loop import restore_checkpoint
import train_hpnn_demo as hdemo


def cg_residual_history(grid, rhs, max_iters, x0=None, exact=None):
    """Relative residual ||r_k|| / ||r_ref|| per CG iteration on the Neumann
    pressure problem (same operator as `ns2d.cg_pressure_solver`). With
    `exact`, also returns the relative FIELD error ||x_k - exact||/||exact||
    per iteration — the quantity the projection loop actually consumes."""

    def neg_lap(p):
        pc = jnp.pad(p, ((1, 1), (1, 1)), mode="edge")
        return -(
            (pc[2:, 1:-1] - 2 * p + pc[:-2, 1:-1]) / grid.dx**2
            + (pc[1:-1, 2:] - 2 * p + pc[1:-1, :-2]) / grid.dy**2
        )

    def ferr(x):
        if exact is None:
            return 0.0
        d = (x - jnp.mean(x)) - (exact - jnp.mean(exact))
        return float(jnp.linalg.norm(d) / (jnp.linalg.norm(exact) + 1e-30))

    b = -(rhs - jnp.mean(rhs))
    ref = jnp.linalg.norm(b) + 1e-30
    x = jnp.zeros_like(b) if x0 is None else (x0 - jnp.mean(x0))
    r = b - neg_lap(x)
    p = r
    rs = jnp.sum(r * r)
    hist = [float(jnp.sqrt(rs)) / float(ref)]
    fhist = [ferr(x)]
    for _ in range(max_iters):
        ap = neg_lap(p)
        denom = jnp.sum(p * ap)
        alpha = rs / jnp.where(denom == 0, 1.0, denom)
        x = x + alpha * p
        r = r - alpha * ap
        rs_new = jnp.sum(r * r)
        beta = rs_new / jnp.where(rs == 0, 1.0, rs)
        p = r + beta * p
        rs = rs_new
        hist.append(float(jnp.sqrt(rs)) / float(ref))
        fhist.append(ferr(x))
    if exact is None:
        return np.asarray(hist)
    return np.asarray(hist), np.asarray(fhist)


def iters_to_tol(hist, tol):
    idx = np.nonzero(hist <= tol)[0]
    return int(idx[0]) if idx.size else None


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint",
                   default="checkpoints/hpnn_neumann_inloop/step_4000")
    p.add_argument("--grid", type=int, default=100)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--dt", type=float, default=2.5e-4)
    p.add_argument("--cg_iters", type=int, default=4)
    p.add_argument("--n_snapshots", type=int, default=8)
    p.add_argument("--amplitude", default="energy",
                   help="'energy' (round-3 fix: Galerkin-optimal scale, no "
                   "1/dx^2 HF amplification) or 'lstsq' (round-2 mode)")
    p.add_argument("--smooth-factor", type=int, default=4)
    p.add_argument("--conv-grids", type=int, nargs="+", default=[32, 64, 128],
                   help="grids for the CNN-solver Taylor convergence study")
    p.add_argument("--out", default="/root/repo/checkpoints/ns_cnn_results.json")
    args = p.parse_args()

    grid = ns2d.MACGrid(args.grid, args.grid, 0.0, math.pi, 0.0, math.pi)

    model_cfg = dataclasses.replace(hdemo.BIG_MODEL, bc_type="neumann")
    model = HPNN(model_cfg)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.ones((1, args.grid, args.grid, 1)),
        jnp.full((1, 2), grid.dx),
    )
    params, _ = restore_checkpoint(os.path.abspath(args.checkpoint), params)

    def make_init(g):
        return ns2d.cnn_pressure_initializer(
            model, params, g, amplitude=args.amplitude,
            smooth_factor=args.smooth_factor,
        )

    init = make_init(grid)
    # round-2's guarded lstsq variant, kept as a comparison row
    init_guarded = ns2d.cnn_pressure_initializer(
        model, params, grid, noise_floor=0.5
    )

    results = {"config": vars(args)}

    # --- 1. in-loop equal-budget comparison ---
    problems = {
        "taylor": (ns2d.taylor_vortex(Re=1.0), 1.0),
        "driven_cavity": (ns2d.driven_cavity(lid_velocity=1.0, y_top=math.pi), 100.0),
    }
    k = args.cg_iters
    for pname, (problem, Re) in problems.items():
        table = {}
        for sname, solver in [
            ("exact_dct", None),
            (f"cg{k}_zero", ns2d.cg_pressure_solver(grid, k)),
            # equal-operator-budget zero baseline for the presmoothed CNN row
            (f"cg{k+2}_zero", ns2d.cg_pressure_solver(grid, k + 2)),
            (f"cg{k}_cnn", ns2d.cg_pressure_solver(grid, k, init)),
            # two-grid pairing: CNN (smooth part) + 2 damped-Jacobi sweeps
            # (high-frequency residual) + k CG iterations = k+2 applies
            (f"cg{k}_cnn_presmooth2",
             ns2d.cg_pressure_solver(grid, k, init, pre_smooth_iterations=2)),
            (f"cg{k}_cnn_guarded_lstsq",
             ns2d.cg_pressure_solver(grid, k, init_guarded)),
        ]:
            cfg = ns2d.NSConfig(method="alg1", Re=Re, dt=args.dt,
                                n_steps=args.steps, helmholtz_iterations=80)
            u, v, pf = ns2d.run(grid, problem, cfg, solver)
            finite = bool(jnp.isfinite(u).all() and jnp.isfinite(v).all())
            div = float(jnp.abs(ns2d.divergence(u, v, grid)).max())
            entry = {"max_div": div if np.isfinite(div) else None,
                     "finite": finite}
            if problem.u_exact is not None and finite:
                verr = ns2d.velocity_error(u, v, grid, problem, args.steps * args.dt)
                entry["velocity_l2"] = verr["u"]["l2"]
            table[sname] = entry
            print(pname, sname, entry, flush=True)
        results[pname] = table

    # --- 2. iteration savings on the loop's own pressure RHS fields ---
    # Round-5 (VERDICT #5): residual-space coarse correction. The CNN start's
    # error is broad-spectrum, so residual-norm tolerances barely move; the
    # coarse DCT solve of the RESIDUAL removes exactly the low-mode component
    # CG is slowest on. Fairness rows: the same correction applied to the zero
    # start (two-grid baseline) — the CNN must beat THAT to claim value.
    # Budget: the correction costs 1 fine operator apply; charge +1 iteration.
    init_coarse_zero = ns2d.coarse_residual_corrected_initializer(grid)
    init_coarse_cnn = ns2d.coarse_residual_corrected_initializer(grid, init)
    savings = {}
    for pname, (problem, Re) in problems.items():
        cfg = ns2d.NSConfig(method="alg1", Re=Re, dt=args.dt,
                            n_steps=args.steps, helmholtz_iterations=80)
        u, v, pf, aux = ns2d.run(grid, problem, cfg, return_aux=True)
        rhs_all = np.asarray(aux["pressure_rhs"])
        idx = np.linspace(0, args.steps - 1, args.n_snapshots).astype(int)
        exact_solve = ns2d.dct_pressure_solver(grid)
        rows = []
        for i in idx:
            rhs = jnp.asarray(rhs_all[i])
            exact = exact_solve(rhs)
            guess = init(rhs)
            h0, f0 = cg_residual_history(grid, rhs, 200, exact=exact)
            hc, fc = cg_residual_history(grid, rhs, 200, x0=guess, exact=exact)
            hz2, fz2 = cg_residual_history(
                grid, rhs, 200, x0=init_coarse_zero(rhs), exact=exact)
            hc2, fc2 = cg_residual_history(
                grid, rhs, 200, x0=init_coarse_cnn(rhs), exact=exact)
            row = {"step": int(i),
                   "rhs_peak": float(jnp.abs(rhs).max()),
                   "start_rel_residual_zero": float(h0[0]),
                   "start_rel_residual_cnn": float(hc[0]),
                   "start_rel_residual_coarse_zero": float(hz2[0]),
                   "start_rel_residual_coarse_cnn": float(hc2[0]),
                   "cnn_field_rel_l2": float(fc[0]),
                   "coarse_zero_field_rel_l2": float(fz2[0]),
                   "coarse_cnn_field_rel_l2": float(fc2[0])}
            for tol in (1e-1, 1e-2, 1e-3):
                row[f"iters_zero_tol{tol:g}"] = iters_to_tol(h0, tol)
                row[f"iters_cnn_tol{tol:g}"] = iters_to_tol(hc, tol)
                # +5: residual apply + 4 post-smooth sweeps inside the
                # correction, each one fine-grid operator application
                z2 = iters_to_tol(hz2, tol)
                c2 = iters_to_tol(hc2, tol)
                row[f"iters_coarse_zero_tol{tol:g}"] = (
                    None if z2 is None else z2 + 5)
                row[f"iters_coarse_cnn_tol{tol:g}"] = (
                    None if c2 is None else c2 + 5)
            # iterations the zero start needs to match the CNN's instant field
            # error (the CNN's real value: a direct approximator, not a Krylov
            # preconditioner — its error is broad-spectrum, so residual-norm
            # tolerances barely move; field error is what the projection uses)
            row["zero_iters_to_match_cnn_field"] = iters_to_tol(f0, fc[0])
            rows.append(row)
            print(pname, row, flush=True)
        savings[pname] = rows
    results["iteration_savings"] = savings

    # --- 3. CNN + k-iteration CG as THE pressure solver: Taylor convergence ---
    # (VERDICT round-2 alternative criterion: the hybrid solver must hold the
    # scheme's 2nd-order grid convergence, not just save iterations). The
    # CNN rows use the two-grid pairing (presmooth 2); zero rows get the same
    # total operator budget (k+2 plain CG iterations).
    conv = {}
    for sname, make_solver in [
        (f"cg{k+2}_zero", lambda g: ns2d.cg_pressure_solver(g, k + 2)),
        (f"cg{k}_cnn_presmooth2",
         lambda g: ns2d.cg_pressure_solver(g, k, make_init(g),
                                           pre_smooth_iterations=2)),
        (f"cg{2*k+2}_zero", lambda g: ns2d.cg_pressure_solver(g, 2 * k + 2)),
        (f"cg{2*k}_cnn_presmooth2",
         lambda g: ns2d.cg_pressure_solver(g, 2 * k, make_init(g),
                                           pre_smooth_iterations=2)),
        ("exact_dct", lambda g: None),
    ]:
        errs = []
        for m in args.conv_grids:
            g = ns2d.MACGrid(m, m, 0.0, math.pi, 0.0, math.pi)
            prob = ns2d.taylor_vortex(Re=1.0)
            cfg = ns2d.NSConfig(method="alg1", Re=1.0, dt=args.dt, n_steps=40,
                                helmholtz_iterations=80)
            u, v, pf = ns2d.run(g, prob, cfg, make_solver(g))
            e = ns2d.velocity_error(u, v, g, prob, cfg.t0 + 40 * args.dt)["u"]["l2"]
            errs.append(e if np.isfinite(e) else None)
        ok = [e for e in errs if e is not None]
        conv[sname] = {
            "grids": list(args.conv_grids), "u_l2": errs,
            "rate": (ns2d.convergence_rates(args.conv_grids, errs)
                     if len(ok) == len(errs) else None),
        }
        print("convergence", sname, conv[sname], flush=True)
    results["solver_convergence"] = conv

    # data-driven summary (round 2's hardcoded negative-result text replaced:
    # the numbers now speak for themselves either way)
    def mean_over(rows, key):
        vals = [r[key] for r in rows if r.get(key) is not None]
        return float(np.mean(vals)) if vals else None

    def savings_pct(rows, tol, vs="cnn"):
        pairs = [
            (r[f"iters_zero_tol{tol:g}"], r[f"iters_{vs}_tol{tol:g}"])
            for r in rows
            if r.get(f"iters_zero_tol{tol:g}") and r.get(f"iters_{vs}_tol{tol:g}")
        ]
        if not pairs:
            return None
        z = sum(a for a, _ in pairs)
        return round(100.0 * (z - sum(b for _, b in pairs)) / z, 1)

    results["summary"] = {
        "amplitude_mode": args.amplitude,
        "mean_cnn_field_rel_l2": {
            p_: mean_over(rows, "cnn_field_rel_l2") for p_, rows in savings.items()
        },
        "cg_iteration_savings_pct_tol1e-3": {
            p_: savings_pct(rows, 1e-3) for p_, rows in savings.items()
        },
        "cg_iteration_savings_pct_tol1e-2": {
            p_: savings_pct(rows, 1e-2) for p_, rows in savings.items()
        },
        "cg_iteration_savings_pct_tol1e-1": {
            p_: savings_pct(rows, 1e-1) for p_, rows in savings.items()
        },
        # round-5 residual-space coarse correction (VERDICT #5): savings vs
        # the plain zero start, for the corrected CNN start AND the corrected
        # zero start (the two-grid baseline the CNN must beat)
        "cg_iteration_savings_pct_tol1e-3_coarse_cnn": {
            p_: savings_pct(rows, 1e-3, "coarse_cnn")
            for p_, rows in savings.items()
        },
        "cg_iteration_savings_pct_tol1e-3_coarse_zero": {
            p_: savings_pct(rows, 1e-3, "coarse_zero")
            for p_, rows in savings.items()
        },
        "mean_coarse_cnn_field_rel_l2": {
            p_: mean_over(rows, "coarse_cnn_field_rel_l2")
            for p_, rows in savings.items()
        },
        "mean_coarse_zero_field_rel_l2": {
            p_: mean_over(rows, "coarse_zero_field_rel_l2")
            for p_, rows in savings.items()
        },
        # CG iterations a zero start needs to reach the CNN's INSTANT field
        # error (the projection loop consumes the field, not the residual)
        "mean_zero_iters_to_match_cnn_field": {
            p_: mean_over(rows, "zero_iters_to_match_cnn_field")
            for p_, rows in savings.items()
        },
        # equal-budget in-loop rows (k CG iters, 100 steps): the loop-level
        # effect the reference experiment was after (solvers.py:244-267)
        "inloop_taylor_velocity_l2": {
            s: results["taylor"][s].get("velocity_l2")
            for s in results["taylor"]
        },
        "inloop_cavity_max_div": {
            s: results["driven_cavity"][s].get("max_div")
            for s in results["driven_cavity"]
        },
        "cnn_solver_taylor_rate": conv[f"cg{k}_cnn_presmooth2"]["rate"],
        "zero_solver_taylor_rate": conv[f"cg{k+2}_zero"]["rate"],
        "cnn_solver_taylor_rate_2k": conv[f"cg{2*k}_cnn_presmooth2"]["rate"],
        "zero_solver_taylor_rate_2k": conv[f"cg{2*k+2}_zero"]["rate"],
    }

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
