"""Production inference API: one-call Poisson solves from trained artifacts.

The reference exposes only model classes wired inside training scripts; a
deployment user has to re-assemble normalization, superposition and amplitude
restoration by hand (`poisson_CNN/models/Poisson_CNN_Legacy.py:15-51` shows the
pieces). `PoissonSolver` packages the whole inference path behind one call:

    from poisson_cnn_tpu.api import PoissonSolver
    solver = PoissonSolver()                       # loads in-repo artifacts
    u = solver.solve(rhs, dx)                      # homogeneous Dirichlet
    u = solver.solve(rhs, dx, boundaries={...})    # nonzero Dirichlet edges
    u_exact = solver.solve_exact(rhs, dx)          # spectral oracle, same API
    solver = PoissonSolver(refine_iterations=4)    # + k-sweep CG polish

`refine_iterations=k` appends k conjugate-gradient sweeps of residual
correction (homogeneous-Dirichlet error equation, boundary preserved exactly)
to either route. The CNN + anchor start is within a few % of the solution, so
a handful of sweeps collapses the out-of-family error tail where a zero start
needs hundreds (study: checkpoints/refine_option.json).

Semantics:
  * `rhs` is the PHYSICAL right-hand side of lap(u) = rhs on a rectangular
    grid with spacing `dx`; the returned field carries physical amplitude
    (the unit-peak network output is rescaled by the two-grid coarse-anchor
    estimator, `models.pcnn.coarse_anchor_amplitude`).
  * boundaries = dict with any of 'left' (u[0, :], length W), 'right'
    (u[-1, :]), 'top' (u[:, 0], length H), 'bottom' (u[:, -1]) — nonzero
    Dirichlet edge values, superposed via DBCNN Laplace solves exactly as the
    reference's combined PCNN.
  * shapes: rhs (H, W), (B, H, W) or (B, H, W, 1) for 2-D; (D, H, W)
    with a trailing dim != 1, or (B, D, H, W, 1), for 3-D (homogeneous BCs
    only — routed to the 3-D artifact). dx a float, (B, 1) or (B, nd). Any
    grid size works (models pad internally); every distinct (shape, edges)
    signature compiles once and is cached.

Artifacts default to the in-repo bench/go-to checkpoints
(`checkpoints/hpnn_fast`, `checkpoints/dbcnn_fast`,
`checkpoints/hpnn_fast_3d_v7`); override with explicit directories holding
`config.json` + `step_N/`.
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .models.dbcnn_fast import DBCNNFast, DBCNNFastConfig
from .models.hpnn import HPNN, HPNNConfig
from .models.hpnn_fast import HPNNFast, load_fast_config
from .models.pcnn import PCNN, PCNNConfig, coarse_anchor_amplitude
from .ops import peak_magnitudes
from .solvers import poisson_solve_dirichlet, poisson_solve_neumann_vertex

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_EDGES = ("left", "top", "right", "bottom")


def _latest_step_dir(artifact_dir: str) -> str:
    """The highest-numbered step_N checkpoint directory under artifact_dir."""
    steps = [
        (int(m.group(1)), d)
        for d in os.listdir(artifact_dir)
        if (m := re.fullmatch(r"step_(\d+)", d)) and
        os.path.isdir(os.path.join(artifact_dir, d))
    ]
    if not steps:
        raise FileNotFoundError(f"no step_N checkpoints under {artifact_dir}")
    return os.path.join(artifact_dir, max(steps)[1])


def _load_dbcnn_fast_config(artifact_dir: str) -> DBCNNFastConfig:
    with open(os.path.join(artifact_dir, "config.json")) as f:
        d = json.load(f)
    for k, v in d.items():
        if isinstance(v, list):
            d[k] = tuple(v)
    return DBCNNFastConfig(**d)


def _load_hpnn_config(artifact_dir: str) -> HPNNConfig:
    with open(os.path.join(artifact_dir, "config.json")) as f:
        d = json.load(f)
    for k, v in d.items():
        if isinstance(v, list):
            d[k] = tuple(v)
    return HPNNConfig(**d)


class PoissonSolver:
    """One-call CNN Poisson solver over trained fast-family artifacts."""

    def __init__(
        self,
        hpnn_dir: Optional[str] = None,
        dbcnn_dir: Optional[str] = None,
        hpnn3d_dir: Optional[str] = None,
        jacobi_iterations: int = 0,
        anchor_resolution: int = 17,
        bc_type: str = "dirichlet",
        refine_iterations: int = 0,
    ):
        from .train.loop import restore_checkpoint

        if bc_type not in ("dirichlet", "neumann"):
            raise ValueError(f"bc_type must be 'dirichlet' or 'neumann', got {bc_type!r}")
        if refine_iterations and bc_type == "neumann":
            raise ValueError(
                "refine_iterations is Dirichlet-only (residual-correction CG "
                "on the homogeneous-Dirichlet error equation)"
            )
        self.bc_type = bc_type
        default_hpnn = "hpnn_fast" if bc_type == "dirichlet" else "hpnn_neumann"
        self.hpnn_dir = hpnn_dir or os.path.join(_REPO_ROOT, "checkpoints", default_hpnn)
        self.dbcnn_dir = dbcnn_dir or os.path.join(_REPO_ROOT, "checkpoints", "dbcnn_fast")
        self.hpnn3d_dir = hpnn3d_dir or os.path.join(
            _REPO_ROOT, "checkpoints", "hpnn_fast_3d_v7"
        )
        self.jacobi_iterations = int(jacobi_iterations)
        self.anchor_resolution = int(anchor_resolution)
        self.refine_iterations = int(refine_iterations)

        if bc_type == "neumann":
            # vertex-grid Neumann HPNN (the reference's deployed NS solver
            # configuration, `Navier_Stokes_2D/solvers.py:29-33`); the
            # NS-specialized fine-tune lives at checkpoints/hpnn_neumann_inloop
            self._hcfg = _load_hpnn_config(self.hpnn_dir)
            self._hpnn = HPNN(self._hcfg)
        else:
            self._hcfg = load_fast_config(os.path.join(self.hpnn_dir, "config.json"))
            self._hpnn = HPNNFast(self._hcfg)
        hp = self._hpnn.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 97, 1)), jnp.full((1, 1), 0.01)
        )
        self._hpnn_params, _ = restore_checkpoint(_latest_step_dir(self.hpnn_dir), hp)

        # DBCNN and 3-D components load lazily: most callers never need both
        self._dbcnn = None
        self._pcnn_params = None
        self._hpnn3d = None
        self._hpnn3d_params = None
        self._cache: Dict = {}

    # -- lazy boundary-solver assembly --------------------------------------
    def _ensure_pcnn(self):
        if self._dbcnn is not None:
            return
        from .train.loop import restore_checkpoint

        dcfg = _load_dbcnn_fast_config(self.dbcnn_dir)
        dbcnn = DBCNNFast(dcfg)
        dp = dbcnn.init(
            jax.random.PRNGKey(0), jnp.ones((1, 97, 1)), jnp.full((1, 1), 0.01), 97
        )
        dp, _ = restore_checkpoint(_latest_step_dir(self.dbcnn_dir), dp)
        cfg = PCNNConfig(
            hpnn_fast=self._hcfg,
            dbcnn_fast=dcfg,
            hpnn_scale_mode="coarse_anchor",
            anchor_resolution=self.anchor_resolution,
            jacobi_iterations=self.jacobi_iterations,
        )
        self._dbcnn = PCNN(cfg)
        self._pcnn_params = {
            "params": {
                "HPNNFast_0": self._hpnn_params["params"],
                "DBCNNFast_0": dp["params"],
            }
        }

    def _ensure_hpnn3d(self):
        if self._hpnn3d is not None:
            return
        from .train.loop import restore_checkpoint

        cfg = load_fast_config(os.path.join(self.hpnn3d_dir, "config.json"))
        self._hpnn3d = HPNNFast(cfg)
        p = self._hpnn3d.init(
            jax.random.PRNGKey(0), jnp.ones((1, 33, 33, 33, 1)), jnp.full((1, 3), 0.01)
        )
        self._hpnn3d_params, _ = restore_checkpoint(
            _latest_step_dir(self.hpnn3d_dir), p
        )

    # -- input canonicalization ---------------------------------------------
    @staticmethod
    def _canon_rhs(rhs, dx) -> tuple:
        """Returns (rhs as (B, *spatial, 1), squeeze, nd). Rank rules (see
        module docstring): 2 -> single 2-D; 3 -> single 3-D volume when dx
        carries 3 spacings, else batched 2-D; 4 with trailing dim 1 ->
        batched 2-D, else single 3-D; 5 -> batched 3-D."""
        rhs = jnp.asarray(rhs, jnp.float32)
        dx_n = jnp.asarray(dx).shape[-1] if jnp.asarray(dx).ndim else 1
        squeeze = False
        if rhs.ndim == 2:
            rhs, squeeze = rhs[None, :, :, None], True
        elif rhs.ndim == 3:
            if dx_n == 3:  # (D, H, W) single volume, disambiguated by dx
                rhs, squeeze = rhs[None, ..., None], True
            else:
                rhs = rhs[..., None]
        elif rhs.ndim == 4 and rhs.shape[-1] != 1:
            rhs, squeeze = rhs[None, ..., None], True
        elif rhs.ndim not in (4, 5):
            raise ValueError(
                "rhs must be (H,W)/(B,H,W)/(B,H,W,1) in 2-D or "
                f"(D,H,W)/(B,D,H,W,1) in 3-D; got {rhs.shape}"
            )
        return rhs, squeeze, rhs.ndim - 2

    @staticmethod
    def _canon_dx(dx, B: int, nd: int = 2) -> jax.Array:
        dx = jnp.asarray(dx, jnp.float32)
        if dx.ndim == 0:
            dx = jnp.full((B, nd), dx)
        elif dx.ndim == 1:  # (1|nd,) shared across the batch
            dx = jnp.broadcast_to(dx[None], (B, dx.shape[0]))
        if dx.shape[-1] == 1:
            dx = jnp.broadcast_to(dx, (B, nd))
        return dx

    @staticmethod
    def _canon_edge(val, B: int, length: int, name: str) -> jax.Array:
        v = jnp.asarray(val, jnp.float32)
        if v.ndim == 1:
            v = jnp.broadcast_to(v[None], (B, length))
        if v.ndim == 2:
            v = v[..., None]
        if v.shape != (B, length, 1):
            raise ValueError(
                f"boundary '{name}' must have shape ({B},{length}[,1]) or "
                f"({length},); got {jnp.asarray(val).shape}"
            )
        return v

    # -- solve paths ----------------------------------------------------------
    @staticmethod
    def _refine(u, rhs, dx2, k: int):
        """k CG iterations of residual correction: solve lap(e) = rhs - lap(u)
        on the homogeneous-Dirichlet error equation and add e back. Preserves
        the boundary of u EXACTLY (e has a zero border), so it serves both the
        homogeneous route and the nonzero-edge superposition route. Kills the
        CNN's high-frequency error tail on rough out-of-family rhs (the p90
        tail study, checkpoints/refine_option.json): the anchor-scaled start
        is within a few % of the solution, so a handful of CG sweeps beats
        hundreds from a zero start."""
        from .solvers import laplacian_dirichlet
        from .solvers.iterative import conjugate_gradient

        r = rhs - laplacian_dirichlet(u, dx2)
        return u + conjugate_gradient(r, dx2, n_iterations=k)

    def _homogeneous_fn(self, shape, nd: int):
        """Jitted HPNN-only solve with physical-amplitude restoration."""
        key = ("h", shape, self.jacobi_iterations, self.refine_iterations)
        if key not in self._cache:
            hpnn = self._hpnn if nd == 2 else self._hpnn3d
            nc, n_jac = self.anchor_resolution, self.jacobi_iterations
            n_ref = self.refine_iterations
            bc = self.bc_type

            @jax.jit
            def fn(params, rhs, dx2):
                bshape = (rhs.shape[0],) + (1,) * (rhs.ndim - 1)
                peaks = peak_magnitudes(rhs)
                safe = jnp.where(peaks > 0, peaks, 1.0)
                rhs_n = rhs / safe.reshape(bshape)
                u_raw = hpnn.apply(params, rhs_n, dx2)
                scale = coarse_anchor_amplitude(u_raw, rhs_n, dx2, nc, bc_type=bc)
                u = u_raw * (scale * peaks).reshape(bshape)
                if n_jac > 0:
                    from .solvers import jacobi_smooth

                    u = jacobi_smooth(u, rhs, dx2, n_jac)
                if n_ref > 0:
                    u = PoissonSolver._refine(u, rhs, dx2, n_ref)
                return u

            self._cache[key] = fn
        return self._cache[key]

    def _pcnn_fn(self, shape):
        key = ("p", shape, self.jacobi_iterations, self.refine_iterations)
        if key not in self._cache:
            model = self._dbcnn
            n_ref = self.refine_iterations

            @jax.jit
            def fn(params, rhs, left, top, right, bottom, dx2):
                u = model.apply(params, rhs, left, top, right, bottom, dx2)
                if n_ref > 0:
                    u = PoissonSolver._refine(u, rhs, dx2, n_ref)
                return u

            self._cache[key] = fn
        return self._cache[key]

    def solve(self, rhs, dx, boundaries: Optional[Dict] = None) -> jax.Array:
        """Solve lap(u) = rhs with homogeneous (default) or per-edge nonzero
        Dirichlet boundary conditions. Returns u with physical amplitude, in
        the batch/sample layout the rhs came in."""
        rhs4, squeeze, nd = self._canon_rhs(rhs, dx)
        B = rhs4.shape[0]
        spatial = rhs4.shape[1:-1]
        dx2 = self._canon_dx(dx, B, nd)

        if not boundaries:
            if nd == 3:
                if self.bc_type == "neumann":
                    raise ValueError("the Neumann route is 2-D (no 3-D Neumann artifact)")
                self._ensure_hpnn3d()
                params = self._hpnn3d_params
            else:
                params = self._hpnn_params
            out = self._homogeneous_fn((B,) + spatial, nd)(params, rhs4, dx2)
        else:
            if self.bc_type == "neumann":
                raise ValueError(
                    "nonzero-edge superposition is Dirichlet-only; "
                    "bc_type='neumann' solves homogeneous Neumann problems"
                )
            if nd != 2:
                raise ValueError(
                    "nonzero boundary superposition is 2-D only (DBCNN edges)"
                )
            unknown = set(boundaries) - set(_EDGES)
            if unknown:
                raise ValueError(f"unknown boundary keys {sorted(unknown)}; "
                                 f"expected subset of {_EDGES}")
            self._ensure_pcnn()
            H, W = spatial
            lengths = {"left": W, "right": W, "top": H, "bottom": H}
            edges = {
                name: (
                    self._canon_edge(boundaries[name], B, lengths[name], name)
                    if name in boundaries
                    else jnp.zeros((B, lengths[name], 1), jnp.float32)
                )
                for name in _EDGES
            }
            out = self._pcnn_fn((B, H, W))(
                self._pcnn_params, rhs4,
                edges["left"], edges["top"], edges["right"], edges["bottom"], dx2,
            )
        return out[0, ..., 0] if squeeze else out

    def solve_exact(self, rhs, dx) -> jax.Array:
        """Spectral FD oracle (exact 5-point solve), same input conventions —
        for accuracy checks against the CNN path (homogeneous BCs of the
        solver's bc_type; Neumann truth is zero-weighted-mean)."""
        rhs4, squeeze, nd = self._canon_rhs(rhs, dx)
        dx2 = self._canon_dx(dx, rhs4.shape[0], nd)
        if self.bc_type == "neumann":
            out = poisson_solve_neumann_vertex(rhs4, dx2, mode="fd")
        else:
            out = poisson_solve_dirichlet(rhs4, dx2, mode="fd")
        return out[0, ..., 0] if squeeze else out


_default_solver: Optional[PoissonSolver] = None


def solve(rhs, dx, boundaries: Optional[Dict] = None) -> jax.Array:
    """Module-level convenience: `poisson_cnn_tpu.api.solve(rhs, dx)` using a
    cached default `PoissonSolver` over the in-repo artifacts."""
    global _default_solver
    if _default_solver is None:
        _default_solver = PoissonSolver()
    return _default_solver.solve(rhs, dx, boundaries)
