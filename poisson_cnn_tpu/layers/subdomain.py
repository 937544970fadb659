"""Subdomain SPP block: coarse-grid features from per-subdomain pyramid pooling.

Capability parity with `poisson_CNN/blocks/subdomain_spp_block.py:8-58`
(experimental, off the live path in the reference): partition the domain into
P x Q subdomains, run SPP within each, map each subdomain's feature vector
through a shared MLP, and reshape the results onto a (P, Q) coarse grid with
the MLP width as channels.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils import resolve_activation
from .core import _bin_edges, spatial_pyramid_pool


class SubdomainSPPBlock(nn.Module):
    subdomains: Tuple[int, int] = (4, 4)
    spp_levels: Tuple = (2, 3)
    mlp_units: Tuple[int, ...] = (32, 16)
    activation: str = "leaky_relu"
    pooling_type: str = "average"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C) -> (B, P, Q, mlp_units[-1])."""
        B = x.shape[0]
        P, Q = self.subdomains
        e0 = _bin_edges(x.shape[1], P)
        e1 = _bin_edges(x.shape[2], Q)
        mlp = [nn.Dense(u) for u in self.mlp_units]
        act = resolve_activation(self.activation)
        rows = []
        for i in range(P):
            cols = []
            for j in range(Q):
                piece = x[:, e0[i] : e0[i + 1], e1[j] : e1[j + 1], :]
                feats = spatial_pyramid_pool(piece, self.spp_levels, self.pooling_type)
                for k, layer in enumerate(mlp):
                    feats = layer(feats)
                    if k < len(mlp) - 1:
                        feats = act(feats)
                cols.append(feats)
            rows.append(jnp.stack(cols, axis=1))  # (B, Q, F)
        return jnp.stack(rows, axis=1)  # (B, P, Q, F)
