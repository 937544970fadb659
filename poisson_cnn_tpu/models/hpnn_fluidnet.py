"""Fluidnet-style HPNN: parallel average-pooling pyramid merged with attention.

Capability parity with the reference's legacy architecture family
(`poisson_CNN/models/legacy/Homogeneous_Poisson_NN.py:35-173`,
`Homogeneous_Poisson_NN_Fluidnet`: parallel AveragePoolingBlock branches at
increasing pool sizes, a learnable attention merge (`MergeWithAttention`), and
dx-MLP einsum channel conditioning — the architecture of Tompson et al.'s
FluidNet adapted to variable grids). The legacy package is unimportable as
shipped; this is a working equivalent.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import compute_domain_sizes, cos_position_embeddings
from ..layers import MergeWithAttention, PadConv, Upsample
from ..utils import resolve_activation


@dataclasses.dataclass(frozen=True)
class FluidnetHPNNConfig:
    pool_sizes: Tuple[int, ...] = (1, 2, 4, 8)
    branch_filters: Tuple[int, ...] = (16, 16, 16)
    branch_kernel_sizes: Tuple[int, ...] = (7, 5, 3)
    dx_mlp_units: Tuple[int, ...] = (64, 64)
    final_filters: Tuple[int, ...] = (8, 1)
    final_kernel_sizes: Tuple[int, ...] = (3, 3)
    activation: str = "leaky_relu"
    use_positional_embeddings: bool = True
    bc_type: str = "dirichlet"
    dtype: Optional[str] = None


class FluidnetHPNN(nn.Module):
    cfg: FluidnetHPNNConfig = FluidnetHPNNConfig()

    @nn.compact
    def __call__(self, rhs: jax.Array, dx: jax.Array, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else rhs.dtype
        B, H, W, _ = rhs.shape
        if dx.shape[-1] == 1:
            dx2 = jnp.broadcast_to(dx, (B, 2))
        else:
            dx2 = dx
        L = compute_domain_sizes(dx2, (H, W))

        x = rhs.astype(dtype)
        if cfg.use_positional_embeddings:
            pos = cos_position_embeddings((H, W), dtype=dtype)
            x = jnp.concatenate([x, jnp.broadcast_to(pos[None], (B, H, W, 2))], -1)

        branches = []
        for p in cfg.pool_sizes:
            if p > 1:
                if min(H, W) < 2 * p:
                    continue
                h = nn.avg_pool(x, (p, p), strides=(p, p), padding="SAME")
            else:
                h = x
            for f, k in zip(cfg.branch_filters, cfg.branch_kernel_sizes):
                h = PadConv(f, k, cfg.activation, "symmetric", dtype=dtype)(h)
            if p > 1:
                h = Upsample("bilinear")(h, (H, W))
            branches.append(h)
        merged = MergeWithAttention()(branches)

        dense = jnp.concatenate([dx2, L], axis=-1).astype(dtype)
        for u in cfg.dx_mlp_units:
            dense = resolve_activation(cfg.activation)(nn.Dense(u, dtype=dtype)(dense))
        dense = nn.Dense(merged.shape[-1], dtype=dtype)(dense)
        merged = merged * dense[:, None, None, :]

        out = merged
        for i, (f, k) in enumerate(zip(cfg.final_filters, cfg.final_kernel_sizes)):
            act = cfg.activation if i < len(cfg.final_filters) - 1 else "linear"
            out = PadConv(f, k, act, dtype=dtype)(out)

        inner = out[:, 1:-1, 1:-1, :]
        if cfg.bc_type == "dirichlet":
            out = jnp.pad(inner, ((0, 0), (1, 1), (1, 1), (0, 0)))
        else:
            out = jnp.pad(inner, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="symmetric")
        return out.astype(rhs.dtype)
