"""PCNN — the combined Poisson solver: superposition of the homogeneous-BC HPNN
solve and four DBCNN Laplace solves (one per boundary edge).

Capability parity with `poisson_CNN/models/Poisson_CNN_Legacy.py:15-51`:
normalize rhs and each BC to unit peak magnitude; hpnn(rhs, dx) scaled by
max_domain_size^2 / rhs_scale (undoing the generator's 1/L_max^2 + rhs-peak
normalizations); dbcnn applied to each edge in a canonical orientation and
mapped back with flips/transposes; the five fields summed; optional Jacobi
smoothing against the true rhs.

Edge conventions (this package): for fields (B, H, W, 1),
left = u[:, 0, :, :], right = u[:, -1, :, :] (length W);
top = u[:, :, 0, :], bottom = u[:, :, -1, :] (length H).
DBCNN predicts with its BC at index 0 of axis 1; transposes/flips map that
canonical frame onto each edge (verified by the BC-trace test).

Zero-BC guard (improvement over the reference, which produces inf/NaN scaling
factors for identically-zero edges): peaks are clamped so an all-zero edge
contributes an exactly-zero field.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import apply_fd_operator, compute_domain_sizes, peak_magnitudes
from ..layers import JacobiIterationLayer
from typing import Optional

from .hpnn import HPNN, HPNNConfig
from .hpnn_fast import HPNNFast, HPNNFastConfig
from .dbcnn import DBCNN, DBCNNConfig
from .dbcnn_fast import DBCNNFast, DBCNNFastConfig


def _safe_unit_normalize(arr: jax.Array):
    """Scale each sample to unit peak, returning (normalized, peaks).

    The caller multiplies the network output back by `peaks` (the reference's
    1/scaling_factor, `Poisson_CNN_Legacy.py:30-45`); an all-zero sample keeps
    peak = 0 so its field contributes exactly zero instead of the NaN the
    reference produces from 0 * inf."""
    peaks = peak_magnitudes(arr)
    safe = jnp.where(peaks > 0, peaks, 1.0)
    norm = arr / safe.reshape((-1,) + (1,) * (arr.ndim - 1))
    return norm, peaks


@dataclasses.dataclass(frozen=True)
class PCNNConfig:
    hpnn: HPNNConfig = HPNNConfig()
    dbcnn: DBCNNConfig = DBCNNConfig()
    # TPU-first component swaps: when set, these replace the reference-parity
    # components with the fast family (same call signatures / conventions)
    hpnn_fast: Optional[HPNNFastConfig] = None
    dbcnn_fast: Optional[DBCNNFastConfig] = None
    jacobi_iterations: int = 0
    # how to restore the homogeneous field's physical amplitude:
    # 'domain' — multiply by L_max^2 * peak(rhs) (reference convention; assumes
    #   the HPNN was trained on 1/L_max^2-normalized solutions);
    # 'match_peak_laplacian' — scale so peak|lap(u_h)| == peak|rhs| (the
    #   reference's match-peak output mode; works with unit-peak-trained HPNNs)
    hpnn_scale_mode: str = "domain"

    def __post_init__(self):
        if self.hpnn_scale_mode not in ("domain", "match_peak_laplacian"):
            raise ValueError(f"unknown hpnn_scale_mode {self.hpnn_scale_mode}")


class PCNN(nn.Module):
    cfg: PCNNConfig = PCNNConfig()

    @nn.compact
    def __call__(
        self,
        rhs: jax.Array,
        left: jax.Array,
        top: jax.Array,
        right: jax.Array,
        bottom: jax.Array,
        dx: jax.Array,
        train: bool = False,
    ):
        B, H, W, _ = rhs.shape
        if dx.shape[-1] == 1:
            dx2 = jnp.broadcast_to(dx, (B, 2))
        else:
            dx2 = dx
        dx_swapped = dx2[:, ::-1]

        rhs_n, rhs_peak = _safe_unit_normalize(rhs)
        left_n, left_peak = _safe_unit_normalize(left)
        top_n, top_peak = _safe_unit_normalize(top)
        right_n, right_peak = _safe_unit_normalize(right)
        bottom_n, bottom_peak = _safe_unit_normalize(bottom)

        cfg = self.cfg
        hpnn = HPNNFast(cfg.hpnn_fast) if cfg.hpnn_fast is not None else HPNN(cfg.hpnn)
        dbcnn = (
            DBCNNFast(cfg.dbcnn_fast) if cfg.dbcnn_fast is not None
            else DBCNN(cfg.dbcnn)
        )

        L = compute_domain_sizes(dx2, (H, W))
        u_h_raw = hpnn(rhs_n, dx2, train=train)
        if self.cfg.hpnn_scale_mode == "match_peak_laplacian":
            lap = apply_fd_operator(u_h_raw, dx2, 5, 2)
            hpnn_scale = rhs_peak / (peak_magnitudes(lap) + 1e-30)
        else:
            hpnn_scale = jnp.max(L, axis=1) ** 2 * rhs_peak
        u_h = u_h_raw * hpnn_scale[:, None, None, None]

        # left edge (i = 0): canonical orientation, no mapping needed
        u_l = dbcnn(left_n, dx2, H, train=train) * left_peak[:, None, None, None]
        # right edge (i = H-1): flip the perpendicular axis
        u_r = dbcnn(right_n, dx2, H, train=train) * right_peak[:, None, None, None]
        u_r = jnp.flip(u_r, axis=1)
        # top edge (j = 0): predict in the transposed frame, swap axes back
        u_t = dbcnn(top_n, dx_swapped, W, train=train) * top_peak[:, None, None, None]
        u_t = jnp.swapaxes(u_t, 1, 2)
        # bottom edge (j = W-1): transposed frame + flip
        u_b = dbcnn(bottom_n, dx_swapped, W, train=train) * bottom_peak[:, None, None, None]
        u_b = jnp.flip(jnp.swapaxes(u_b, 1, 2), axis=2)

        pred = u_h + u_l + u_r + u_t + u_b
        if self.cfg.jacobi_iterations > 0:
            pred = JacobiIterationLayer(self.cfg.jacobi_iterations)(pred, rhs, dx2)
        return pred
