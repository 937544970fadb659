"""DBCNN — the Dirichlet-boundary Laplace solver network.

Capability parity with `poisson_CNN/models/Dirichlet_BC_NN_Legacy.py:14-166`
(defaults follow `poisson_CNN/experiments/dbcnn.json`): input
[bc (B, W, 1), dx (B, 1|2), x_output_resolution (static int)] ->
  1-D conv+resnet stack on [bc, 1-D positional embeddings];
  SPP of the conv features + (dx, normalized domain sizes) -> MLP whose last
  width = number of sinh modes;
  x-direction basis sinh(m*pi*(x_hat-1)) normalized per mode to peak 1
  (computed in a numerically stable exp form — no fp32 overflow for any mode
  count, unlike the reference which warns above 27 modes at `:39-40`);
  outer-product einsum of (bc features, sinh basis, MLP output);
  2-D conv stack over [result, positional embeddings];
  per-sample max-magnitude normalization to 1; BC row re-imposed by concat;
  optional Jacobi post-smoother.

Output orientation: (B, x_output_resolution, W, 1) with the boundary at index 0
of axis 1 (the 'left' edge in this package's boundary convention).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    compute_domain_sizes,
    cos_position_embeddings,
    set_max_magnitude_in_batch,
)
from ..layers import (
    JacobiIterationLayer,
    PadConv,
    ResNetBlock,
    norm_layer,
    spatial_pyramid_pool,
)
from ..utils import resolve_activation


def stable_sinh_modes(n_modes: int, n_points: int, dtype=jnp.float32) -> jax.Array:
    """Peak-normalized sinh basis: sinh(m*pi*(x_hat-1)) / sinh(m*pi), x_hat in
    [0, 1]. Stable closed form with all exponents <= 0:
        (exp(a(x-2)) - exp(-a x)) / (1 - exp(-2a)),  a = m*pi.
    Peak magnitude 1 at x_hat = 0 (value -1), zero at x_hat = 1.
    Returns (n_modes, n_points)."""
    x = jnp.linspace(0.0, 1.0, n_points, dtype=dtype)
    a = (jnp.arange(1, n_modes + 1, dtype=dtype) * math.pi)[:, None]
    num = jnp.exp(a * (x[None, :] - 2.0)) - jnp.exp(-a * x[None, :])
    den = 1.0 - jnp.exp(-2.0 * a)
    return num / den


@dataclasses.dataclass(frozen=True)
class DBCNNConfig:
    """Defaults mirror `experiments/dbcnn.json` (downsized for tests via fields)."""

    boundary_filters: Tuple[int, ...] = (2, 4, 6, 8, 12, 16, 24, 27)
    boundary_kernel_sizes: Tuple[int, ...] = (19, 17, 15, 13, 11, 9, 7, 5)
    boundary_padding_mode: str = "symmetric"
    boundary_activation: str = "leaky_relu"
    spp_levels: Tuple = (2, 3, 4, 5, 8, 11, 15, 30, 45)
    spp_pooling: str = "average"
    mlp_units: Tuple[int, ...] = (512, 256)
    mlp_activation: str = "tanh"
    n_modes: int = 27  # last MLP width == # sinh modes == last boundary filters
    final_filters: Tuple[int, ...] = (23, 19, 15, 11, 7, 5, 3, 1)
    final_kernel_sizes: Tuple[int, ...] = (7, 7, 5, 5, 5, 3, 3, 3)
    final_regular_conv_stages: int = 3
    final_activation: str = "tanh"
    use_batchnorm: bool = False
    postsmoother_iterations: int = 0
    dtype: Optional[str] = None


class DBCNN(nn.Module):
    cfg: DBCNNConfig = DBCNNConfig()

    @nn.compact
    def __call__(
        self, bc: jax.Array, dx: jax.Array, x_output_resolution: int,
        train: bool = False,
    ):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else bc.dtype
        B, W, _ = bc.shape
        H = int(x_output_resolution)
        grid_shape = (H, W)
        if dx.shape[-1] == 1:
            dx2 = jnp.broadcast_to(dx, (B, 2))
        else:
            dx2 = dx
        domain_sizes = compute_domain_sizes(dx2, grid_shape)
        max_L = jnp.max(domain_sizes, axis=1, keepdims=True)

        pos_nd = cos_position_embeddings(grid_shape, dtype=dtype)  # (H, W, 2)
        pos_nd_b = jnp.broadcast_to(pos_nd[None], (B, H, W, 2))
        pos_1d = jnp.broadcast_to(pos_nd[0][None], (B, W, 2))  # x_hat = 0 row

        # 1-D conv + resnet stack on the boundary data
        h = jnp.concatenate([bc.astype(dtype), pos_1d], axis=-1)
        for f, k in zip(cfg.boundary_filters, cfg.boundary_kernel_sizes):
            h = PadConv(f, k, cfg.boundary_activation, cfg.boundary_padding_mode,
                        dtype=dtype)(h)
            if cfg.use_batchnorm:
                h = norm_layer(dtype)(h)
            h = ResNetBlock(f, k, cfg.boundary_activation,
                            cfg.boundary_padding_mode, dtype=dtype)(h, train=train)
        bc_features = h  # (B, W, M_boundary)

        # SPP + domain info -> MLP -> per-mode weights
        spp = spatial_pyramid_pool(bc_features, cfg.spp_levels, cfg.spp_pooling)
        dense_inp = jnp.concatenate(
            [dx2.astype(dtype), (domain_sizes / max_L).astype(dtype), spp], axis=-1
        )
        d = dense_inp
        for u in cfg.mlp_units:
            d = resolve_activation(cfg.mlp_activation)(nn.Dense(u, dtype=dtype)(d))
        d = resolve_activation(cfg.mlp_activation)(
            nn.Dense(cfg.n_modes, dtype=dtype)(d)
        )  # (B, M)

        if bc_features.shape[-1] != cfg.n_modes:
            raise ValueError(
                "last boundary_filters entry must equal n_modes "
                f"({bc_features.shape[-1]} != {cfg.n_modes})"
            )

        sinh = stable_sinh_modes(cfg.n_modes, H, dtype=dtype)  # (M, H)
        out = jnp.einsum("bym,mx,bm->bxym", bc_features, sinh, d)  # (B, H, W, M)

        out = jnp.concatenate([out, pos_nd_b], axis=-1)
        n_final = len(cfg.final_filters)
        n_pairs = n_final - cfg.final_regular_conv_stages
        for i in range(n_pairs):
            f, k = cfg.final_filters[i], cfg.final_kernel_sizes[i]
            out = PadConv(f, k, cfg.final_activation, dtype=dtype)(out)
            out = ResNetBlock(f, k, cfg.final_activation, dtype=dtype)(out, train=train)
        for i in range(n_pairs, n_final):
            out = PadConv(
                cfg.final_filters[i], cfg.final_kernel_sizes[i],
                cfg.final_activation, dtype=dtype,
            )(out)

        out = set_max_magnitude_in_batch(out, 1.0, eps=1e-30)
        out = out.astype(bc.dtype)
        # re-impose the boundary row at x_hat = 0
        out = jnp.concatenate([bc[:, None, :, :], out[:, 1:, :, :]], axis=1)

        if cfg.postsmoother_iterations > 0:
            out = JacobiIterationLayer(cfg.postsmoother_iterations)(
                out, jnp.zeros_like(out), dx2
            )
        return out
