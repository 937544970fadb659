"""Accuracy evaluation utilities: relative-L2 metrics against analytic or
solver-computed ground truth.

This is the quantitative harness behind BASELINE.md's accuracy target
("paper-level relative L2 error on variable-size grids") — the reference has no
dedicated evaluation module; its accuracy claims live in the paper.
"""

from __future__ import annotations

from typing import Callable, Dict, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from .data import ReverseConfig, generate_batch


def relative_l2(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Per-sample ||pred - target|| / ||target||. (B,)."""
    diff = (pred - target).reshape(pred.shape[0], -1)
    tgt = target.reshape(target.shape[0], -1)
    return jnp.linalg.norm(diff, axis=1) / (jnp.linalg.norm(tgt, axis=1) + 1e-30)


def summarize(errors: np.ndarray) -> Dict[str, float]:
    return {
        "rel_l2_mean": float(errors.mean()),
        "rel_l2_median": float(np.median(errors)),
        "rel_l2_p90": float(np.percentile(errors, 90)),
        "n": int(errors.size),
    }


def evaluate_hpnn(
    apply_fn: Callable,
    data_cfg: ReverseConfig,
    grid_shapes: Sequence[Tuple[int, int]] = ((97, 97), (65, 129)),
    n_batches: int = 4,
    seed: int = 10_000,
) -> Dict[str, float]:
    """rel-L2 of an HPNN-like model (apply_fn(rhs, dx) -> pred) against the
    generator's analytic solutions on held-out variable grids."""
    errs = []
    for i in range(n_batches):
        shape = grid_shapes[i % len(grid_shapes)]
        batch = generate_batch(jax.random.PRNGKey(seed + i), data_cfg, shape)
        pred = apply_fn(batch["rhs"], batch["dx"])
        errs.append(np.asarray(relative_l2(pred, batch["soln"])))
    return summarize(np.concatenate(errs))


def solver_baseline(
    solve_fn: Callable,
    data_cfg: ReverseConfig,
    grid_shapes: Sequence[Tuple[int, int]] = ((97, 97), (65, 129)),
    n_batches: int = 4,
    seed: int = 10_000,
) -> Dict[str, float]:
    """Same protocol for a classical solver (solve_fn(rhs, dx) -> u) — e.g. the
    FD spectral solve gives the discretization-error floor a CNN can approach.
    NOTE: apply matching normalization — if data normalizes solutions
    (soln_max_magnitude / 1/L_max^2), solver output must be scaled accordingly
    before comparison; this helper assumes un-normalized solutions."""
    errs = []
    for i in range(n_batches):
        shape = grid_shapes[i % len(grid_shapes)]
        batch = generate_batch(jax.random.PRNGKey(seed + i), data_cfg, shape)
        u = solve_fn(batch["rhs"], batch["dx"])
        errs.append(np.asarray(relative_l2(u, batch["soln"])))
    return summarize(np.concatenate(errs))
