"""Metalearning (hypernetwork) model family: HPNN and DBCNN variants whose conv
kernels are generated per sample from grid information.

Capability parity with `poisson_CNN/models/Homogeneous_Poisson_NN_Metalearning.py`
and `Dirichlet_BC_NN_Metalearning.py`. NOTE: the reference constructors are
broken as shipped (undefined names, SURVEY.md §1 "dead/broken code"); these are
working equivalents of the documented architecture: the same macro-structure as
the plain HPNN/DBCNN but with every conv replaced by a hypernetwork conv
(implicit-GEMM per-sample kernels, `layers.metalearning`), conditioned on
[dx, domain_sizes].
"""

from __future__ import annotations

import dataclasses
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
    MetaBottleneckBlock,
    MetaConv,
    spatial_pyramid_pool,
)
from .dbcnn import stable_sinh_modes


@dataclasses.dataclass(frozen=True)
class MetaHPNNConfig:
    pre_filters: Tuple[int, ...] = (4, 16)
    pre_kernel_sizes: Tuple[int, ...] = (11, 7)
    bottleneck_downsampling_factors: Tuple[int, ...] = (2, 4, 8)
    bottleneck_conv_kernel_sizes: Tuple[int, ...] = (7, 5, 3)
    bottleneck_deconv_kernel_sizes: Tuple[int, ...] = (2, 4, 8)
    bottleneck_upsample_modes: Tuple[str, ...] = ("deconv", "deconv", "resize")
    bottleneck_filters: int = 16
    bottleneck_n_convs: int = 2
    final_filters: Tuple[int, ...] = (16, 8, 1)
    final_kernel_sizes: Tuple[int, ...] = (5, 3, 3)
    hidden_units: Tuple[int, ...] = (16, 32)
    activation: str = "leaky_relu"
    use_positional_embeddings: bool = True
    bc_type: str = "dirichlet"
    # bound the output like the fast family: the training data convention is
    # unit-peak solutions (soln_max_magnitude), and without bounding the
    # hypernetwork stack's free overall scale makes optimization chase
    # amplitude instead of shape (round-5 zoo fix)
    output_scaling: Optional[str] = "soln_max_magnitude"
    dtype: Optional[str] = None


class MetaHPNN(nn.Module):
    cfg: MetaHPNNConfig = MetaHPNNConfig()

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
        dense_inp = jnp.concatenate([dx2, L], axis=-1).astype(dtype)

        x = rhs.astype(dtype)
        if cfg.use_positional_embeddings:
            pos = cos_position_embeddings((H, W), dtype=dtype)
            x = jnp.concatenate([x, jnp.broadcast_to(pos[None], (B, H, W, 2))], -1)

        for f, k in zip(cfg.pre_filters, cfg.pre_kernel_sizes):
            x = MetaConv(f, k, cfg.activation, "symmetric",
                         hidden_units=cfg.hidden_units)(x, dense_inp)

        branches = []
        for ds, ck, dk, um in zip(
            cfg.bottleneck_downsampling_factors,
            cfg.bottleneck_conv_kernel_sizes,
            cfg.bottleneck_deconv_kernel_sizes,
            cfg.bottleneck_upsample_modes,
        ):
            if min(H, W) < 2 * ds:
                continue
            branches.append(
                MetaBottleneckBlock(
                    downsampling_factor=ds,
                    filters=cfg.bottleneck_filters,
                    conv_kernel_size=ck,
                    n_convs=cfg.bottleneck_n_convs,
                    upsample_mode=um,
                    deconv_kernel_size=dk,
                    use_resnet=True,
                    conv_activation=cfg.activation,
                    hidden_units=cfg.hidden_units,
                )(x, dense_inp, train=train)
            )
        if branches:
            x = sum(branches) / float(len(branches))
        else:
            x = MetaConv(cfg.bottleneck_filters, 5, cfg.activation,
                         hidden_units=cfg.hidden_units)(x, dense_inp)

        for i, (f, k) in enumerate(zip(cfg.final_filters, cfg.final_kernel_sizes)):
            act = cfg.activation if i < len(cfg.final_filters) - 1 else "linear"
            x = MetaConv(f, k, act, hidden_units=cfg.hidden_units)(x, dense_inp)

        if cfg.output_scaling == "soln_max_magnitude":
            x = set_max_magnitude_in_batch(x, 1.0, eps=1e-30)
        inner = x[:, 1:-1, 1:-1, :]
        if cfg.bc_type == "dirichlet":
            x = jnp.pad(inner, ((0, 0), (1, 1), (1, 1), (0, 0)))
        else:
            x = jnp.pad(inner, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="symmetric")
        return x.astype(rhs.dtype)


@dataclasses.dataclass(frozen=True)
class MetaDBCNNConfig:
    # sized to the non-meta DBCNN's scale: the reference's metalearning
    # variant is config-driven at the SAME capacity as the main model (it
    # warns only above 27 sinh modes, Dirichlet_BC_NN_Metalearning.py:33-36).
    # The original thin defaults (16 modes, 128/64 MLP) plateaued at 26%
    # in-family, a half-width bump (24 modes, 256/128) at 23%, while the
    # 27-mode/512-256 DBCNN reaches 7.9% (round-5 zoo capacity ladder).
    boundary_filters: Tuple[int, ...] = (4, 8, 16, 27)
    boundary_kernel_sizes: Tuple[int, ...] = (15, 11, 7, 5)
    spp_levels: Tuple = (2, 3, 5, 8, 15, 30)
    mlp_units: Tuple[int, ...] = (512, 256)
    n_modes: int = 27
    final_filters: Tuple[int, ...] = (19, 11, 5, 1)
    final_kernel_sizes: Tuple[int, ...] = (7, 5, 3, 3)
    hidden_units: Tuple[int, ...] = (16, 32)
    activation: str = "leaky_relu"
    dtype: Optional[str] = None


class MetaDBCNN(nn.Module):
    """Metalearning twin of the DBCNN (`Dirichlet_BC_NN_Metalearning.py:123-183`):
    hypernetwork 1-D convs on the boundary + LayerNorm MLP + sinh synthesis +
    hypernetwork 2-D refinement."""

    cfg: MetaDBCNNConfig = MetaDBCNNConfig()

    @nn.compact
    def __call__(self, bc: jax.Array, dx: jax.Array, x_output_resolution: int,
                 train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else bc.dtype
        B, W, _ = bc.shape
        H = int(x_output_resolution)
        if dx.shape[-1] == 1:
            dx2 = jnp.broadcast_to(dx, (B, 2))
        else:
            dx2 = dx
        L = compute_domain_sizes(dx2, (H, W))
        dense_grid = jnp.concatenate(
            [dx2, L / jnp.max(L, axis=1, keepdims=True)], axis=-1
        ).astype(dtype)

        pos_nd = cos_position_embeddings((H, W), dtype=dtype)
        pos_1d = jnp.broadcast_to(pos_nd[0][None], (B, W, 2))

        h = jnp.concatenate([bc.astype(dtype), pos_1d], axis=-1)
        for f, k in zip(cfg.boundary_filters, cfg.boundary_kernel_sizes):
            h = MetaConv(f, k, cfg.activation, "symmetric",
                         hidden_units=cfg.hidden_units)(h, dense_grid)
        if h.shape[-1] != cfg.n_modes:
            h = MetaConv(cfg.n_modes, 3, cfg.activation,
                         hidden_units=cfg.hidden_units)(h, dense_grid)

        spp = spatial_pyramid_pool(h, cfg.spp_levels)
        d = jnp.concatenate([dense_grid, spp], axis=-1)
        for u in cfg.mlp_units:
            d = jnp.tanh(nn.Dense(u, dtype=dtype)(d))
            d = nn.LayerNorm(dtype=dtype)(d)
        d = jnp.tanh(nn.Dense(cfg.n_modes, dtype=dtype)(d))

        sinh = stable_sinh_modes(cfg.n_modes, H, dtype=dtype)
        out = jnp.einsum("bym,mx,bm->bxym", h, sinh, d)
        out = jnp.concatenate([out, jnp.broadcast_to(pos_nd[None], (B, H, W, 2))], -1)
        for i, (f, k) in enumerate(zip(cfg.final_filters, cfg.final_kernel_sizes)):
            act = "tanh" if i < len(cfg.final_filters) - 1 else "linear"
            out = MetaConv(f, k, act, hidden_units=cfg.hidden_units)(out, dense_grid)
        out = set_max_magnitude_in_batch(out, 1.0, eps=1e-30)
        out = out.astype(bc.dtype)
        return jnp.concatenate([bc[:, None, :, :], out[:, 1:, :, :]], axis=1)
