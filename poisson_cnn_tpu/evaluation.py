"""Accuracy evaluation utilities: relative-L2 metrics against analytic or
solver-computed ground truth.

This is the quantitative harness behind BASELINE.md's accuracy target
(explicit bar: <=5% mean rel-L2 on held-out variable-size grids; the paper
arXiv:1910.08613 is unreachable from this environment) — the reference has no
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


def evaluate_hpnn_coarse_noise(
    apply_fn: Callable,
    grid_shapes: Sequence[Tuple[int, int]] = ((97, 97), (65, 129)),
    n_batches: int = 4,
    seed: int = 20_000,
    dx_range: Tuple[float, float] = (5e-3, 5e-2),
    batch_size: int = 32,
    normalize_like_training: bool = True,
    bc_type: str = "dirichlet",
) -> Dict[str, float]:
    """OUT-OF-FAMILY protocol: coarse-noise random RHS (the reference's own
    training distribution — uniform noise on a coarse control grid, bicubic
    supersampled, `poisson_CNN/dataset/generators/numerical.py:10-35`),
    homogeneous Dirichlet BCs, spectral FD ground truth.

    This is the standard second column for every HPNN-family artifact: the
    in-family `evaluate_hpnn` scores against the same generator family the
    models train on; this one scores against a structurally different RHS
    distribution (no truncated-series structure), which is what exposed the
    round-2 PCNN gap (10.9% in-family vs 26.8% coarse-noise).

    normalize_like_training applies the artifacts' training convention
    (rhs -> unit peak pair-consistently, then soln -> unit peak) so bounded
    unit-peak-output models are scored on field shape, like their in-family
    numbers.

    WARNING: normalize_like_training=True re-peaks the solution AFTER the
    pair-consistent rhs scaling, which breaks lap(soln)=rhs consistency — it is
    only valid for unit-peak-output models (output_scaling='soln_max_magnitude',
    true of every in-repo artifact). For a physically-scaled model (e.g.
    match_peak_laplacian), pass normalize_like_training=False and score against
    the raw solver solution.

    bc_type='neumann' (2-D only) Neumann-izes the protocol for the vertex-grid
    Neumann artifacts (the reference's deployed NS configuration,
    `Navier_Stokes_2D/solvers.py:29-33`): the coarse-noise RHS is projected onto
    the solvable subspace (weighted zero mean), truth comes from the DCT-I
    vertex Neumann solve, and — the solution being defined only up to a
    constant — pred and truth are mean-removed (then both unit-peaked under
    normalize_like_training) before the rel-L2.
    """
    from .data import GridSamplingConfig
    from .data.numerical import (
        NumericalConfig,
        _random_coarse_noise_nd,
        generate_numerical_batch,
    )
    from .ops import (
        set_max_magnitude_in_batch,
        set_max_magnitude_in_batch_and_return_scaling_factors,
    )
    from .solvers import poisson_solve_dirichlet, poisson_solve_neumann_vertex

    ndims = len(grid_shapes[0])
    if bc_type == "neumann" and ndims != 2:
        raise ValueError("the Neumann coarse-noise protocol is 2-D (vertex DCT-I)")

    def _trapezoid_mean_removed(x):
        """Subtract the per-sample weighted mean (endpoint weight 1/2 per axis
        — the DCT-I zero-mode projection weights)."""
        w0 = jnp.ones((x.shape[1],)).at[0].set(0.5).at[-1].set(0.5)
        w1 = jnp.ones((x.shape[2],)).at[0].set(0.5).at[-1].set(0.5)
        W = (w0[:, None] * w1[None, :])[None, :, :, None]
        mean = jnp.sum(x * W, axis=(1, 2, 3), keepdims=True) / jnp.sum(W)
        return x - mean
    cfg = None
    if ndims == 2:
        # keep the exact round-3 2-D protocol (same key splits/draws) so the
        # artifact coarse-noise rows stay comparable across rounds
        cfg = NumericalConfig(
            batch_size=batch_size,
            grids=GridSamplingConfig(((64, 128), (64, 128)), dx_range),
            rhs="random",
            nonzero_boundaries=(),
            field_type="coarse_noise",
            solver="spectral",
        )

    def nd_batch(key, shape):
        # N-D path: coarse-noise RHS, homogeneous Dirichlet, FD-spectral truth
        k_dx, k_rhs = jax.random.split(key)
        dx = jax.random.uniform(
            k_dx, (batch_size, 1), minval=dx_range[0], maxval=dx_range[1]
        )
        rhs = _random_coarse_noise_nd(k_rhs, batch_size, shape, (0.5, 1.5))
        soln = poisson_solve_dirichlet(rhs, dx, mode="fd")
        return {"rhs": rhs, "dx": dx, "soln": soln}

    errs = []
    for i in range(n_batches):
        shape = grid_shapes[i % len(grid_shapes)]
        if ndims == 2:
            batch = generate_numerical_batch(jax.random.PRNGKey(seed + i), cfg, shape)
        else:
            batch = nd_batch(jax.random.PRNGKey(seed + i), shape)
        rhs, soln = batch["rhs"], batch["soln"]
        if bc_type == "neumann":
            rhs = _trapezoid_mean_removed(rhs)  # solvable subspace
            soln = poisson_solve_neumann_vertex(rhs, batch["dx"], mode="fd")
        if normalize_like_training:
            rhs, f = set_max_magnitude_in_batch_and_return_scaling_factors(rhs, 1.0)
            soln = soln * f.reshape((-1,) + (1,) * (soln.ndim - 1))
            soln = set_max_magnitude_in_batch(soln, 1.0)
        pred = apply_fn(rhs, batch["dx"])
        if bc_type == "neumann":
            pred = _trapezoid_mean_removed(pred)
            soln = _trapezoid_mean_removed(soln)
            if normalize_like_training:
                pred = set_max_magnitude_in_batch(pred, 1.0)
                soln = set_max_magnitude_in_batch(soln, 1.0)
        errs.append(np.asarray(relative_l2(pred, soln)))
    return summarize(np.concatenate(errs))


def evaluate_hpnn_gaussian_mg(
    apply_fn: Callable,
    grid_shapes: Sequence[Tuple[int, int]] = ((97, 97), (65, 129)),
    n_batches: int = 4,
    seed: int = 30_000,
    dx_range: Tuple[float, float] = (5e-3, 5e-2),
    batch_size: int = 32,
    normalize_like_training: bool = True,
    max_bumps: int = 4,
    tol: float = 1e-10,
) -> Dict[str, float]:
    """THIRD independent eval column: Gaussian-bump RHS scored against the
    in-tree host C++ multigrid oracle.

    Independence from the other two columns on both axes:
    - RHS family: sums of 1-4 localized Gaussian sources (random centers,
      widths, signs) — structurally unlike both the in-family truncated
      series/Taylor data and the coarse-control-grid noise column.
    - Ground truth: the native C++ geometric multigrid
      (`native/poisson_mg.cpp`, the analog of the reference's pyamg oracle,
      `poisson_CNN/dataset/solvers/multigrid.py:98-150`) rather than the JAX
      spectral solvers, closing the self-referential-evaluation loop.

    2-D only (the host oracle is 2-D). Raises RuntimeError if the native
    library is unavailable. Same unit-peak normalization caveat as
    `evaluate_hpnn_coarse_noise`: normalize_like_training=True is only valid
    for unit-peak-output models.
    """
    from .native import multigrid_poisson_solve_host
    from .ops import (
        set_max_magnitude_in_batch,
        set_max_magnitude_in_batch_and_return_scaling_factors,
    )

    if len(grid_shapes[0]) != 2:
        raise ValueError("gaussian_mg column is 2-D only (host oracle)")

    def make_batch(rng, shape):
        ny, nx = shape
        yhat = np.linspace(0.0, 1.0, ny)[:, None]
        xhat = np.linspace(0.0, 1.0, nx)[None, :]
        rhs = np.zeros((batch_size, ny, nx), dtype=np.float64)
        for b in range(batch_size):
            for _ in range(int(rng.integers(1, max_bumps + 1))):
                cy, cx = rng.uniform(0.15, 0.85, size=2)
                sy, sx = rng.uniform(0.04, 0.15, size=2)
                amp = rng.uniform(0.3, 1.0) * rng.choice((-1.0, 1.0))
                rhs[b] += amp * np.exp(
                    -((yhat - cy) ** 2 / (2 * sy**2) + (xhat - cx) ** 2 / (2 * sx**2))
                )
        dx = rng.uniform(dx_range[0], dx_range[1], size=(batch_size, 1))
        soln = multigrid_poisson_solve_host(rhs, dx, tol=tol)
        return (
            jnp.asarray(rhs[..., None], dtype=jnp.float32),
            jnp.asarray(dx, dtype=jnp.float32),
            jnp.asarray(soln[..., None], dtype=jnp.float32),
        )

    errs = []
    for i in range(n_batches):
        shape = grid_shapes[i % len(grid_shapes)]
        rhs, dx, soln = make_batch(np.random.default_rng(seed + i), shape)
        if normalize_like_training:
            rhs, f = set_max_magnitude_in_batch_and_return_scaling_factors(rhs, 1.0)
            soln = soln * f.reshape((-1,) + (1,) * (soln.ndim - 1))
            soln = set_max_magnitude_in_batch(soln, 1.0)
        pred = apply_fn(rhs, dx)
        errs.append(np.asarray(relative_l2(pred, soln)))
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
