"""HPNN — the homogeneous-BC Poisson solver network (flagship model).

Capability parity with the reference's live HPNN
(`poisson_CNN/models/Homogeneous_Poisson_NN_Legacy.py:11-257`; defaults follow
`poisson_CNN/experiments/hpnn.json`):
input [rhs (B,H,W,1), dx (B,1|2)] ->
  cos(pi*x_hat) positional embeddings concat;
  pre-bottleneck conv stack (symmetric padding);
  parallel multi-resolution branches: deconv-upsample bottlenecks (small
  downsampling factors) + resize-upsample bottlenecks (large factors) + one
  non-bottleneck conv; branch-mean merge; post-merge conv + resnet;
  dx-MLP channel modulation (einsum over channels);
  final conv stack (channel-shrinking resnet pairs, then plain linear convs);
  optional learned Scaling; BC enforcement by crop-and-repad (zero pad =
  Dirichlet, symmetric pad = Neumann); optional Jacobi post-smoother.

TPU-first: NHWC layout, static shapes per compile (variable grids = bucketed
recompiles), bf16-friendly compute dtype, everything jit/vmap/grad-safe.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    apply_fd_operator,
    compute_domain_sizes,
    cos_position_embeddings,
    peak_magnitudes,
    set_max_magnitude_in_batch,
)
from ..layers import (
    BottleneckBlock,
    JacobiIterationLayer,
    PadConv,
    ResNetBlock,
    Scaling,
    norm_layer,
)
from ..utils import resolve_activation


def _safe_unit_peak(arr):
    peaks = peak_magnitudes(arr)
    safe = jnp.where(peaks > 0, peaks, 1.0)
    return arr / safe.reshape((-1,) + (1,) * (arr.ndim - 1)), peaks


@dataclasses.dataclass(frozen=True)
class HPNNConfig:
    """Defaults mirror `experiments/hpnn.json` (downsized variants for tests)."""

    pre_filters: Tuple[int, ...] = (4, 16, 32)
    pre_kernel_sizes: Tuple[int, ...] = (15, 13, 11)
    pre_padding_mode: str = "symmetric"
    deconv_downsampling_factors: Tuple[int, ...] = (2, 3, 4, 8, 16)
    deconv_kernel_sizes: Tuple[int, ...] = (2, 3, 4, 8, 16)
    deconv_conv_kernel_sizes: Tuple[int, ...] = (11, 9, 7, 7, 7)
    resize_downsampling_factors: Tuple[int, ...] = (32, 64, 128)
    resize_conv_kernel_sizes: Tuple[int, ...] = (5, 5, 5)
    resize_methods: Tuple[str, ...] = ("bicubic", "bilinear", "nearest")
    bottleneck_filters: int = 32
    bottleneck_n_convs: int = 3
    bottleneck_use_resnet: bool = True
    bottleneck_activation: str = "leaky_relu"
    final_filters: Tuple[int, ...] = (32, 28, 24, 20, 16, 12, 8, 4, 1)
    final_kernel_sizes: Tuple[int, ...] = (15, 13, 9, 7, 5, 3, 3, 3, 3)
    final_regular_conv_stages: int = 2
    final_activation: str = "leaky_relu"
    dx_mlp_units: Tuple[int, ...] = (100, 100)
    activation: str = "leaky_relu"
    use_batchnorm: bool = False
    use_positional_embeddings: bool = True
    use_scaling: bool = False
    remat_branches: bool = False  # rematerialize bottleneck branches under AD
    # (trades recompute for activation memory on 384^2-512^2 training grids)
    postsmoother_iterations: int = 0
    bc_type: str = "dirichlet"  # 'dirichlet' | 'neumann'
    dtype: Optional[str] = None  # e.g. 'bfloat16' compute dtype
    # input normalization / output scaling modes (reference
    # `process_normalizations` / `process_output_scaling_modes`,
    # `Homogeneous_Poisson_NN_Metalearning.py:27-57`, applied in
    # `Homogeneous_Poisson_NN.py:124-141,150-188`):
    normalize_rhs_max_magnitude: bool = False
    output_scaling: Optional[str] = None
    # None | 'rhs_max_magnitude' | 'max_domain_size_squared' |
    # 'rhs_max_magnitude_and_max_domain_size_squared' | 'soln_max_magnitude' |
    # 'match_peak_laplacian_magnitude_to_peak_rhs'

    def __post_init__(self):
        if self.bc_type not in ("dirichlet", "neumann"):
            raise ValueError("bc_type must be dirichlet or neumann")
        allowed = (
            None, "rhs_max_magnitude", "max_domain_size_squared",
            "rhs_max_magnitude_and_max_domain_size_squared",
            "soln_max_magnitude", "match_peak_laplacian_magnitude_to_peak_rhs",
        )
        if self.output_scaling not in allowed:
            raise ValueError(f"unknown output_scaling {self.output_scaling}")


class HPNN(nn.Module):
    cfg: HPNNConfig = HPNNConfig()

    @nn.compact
    def __call__(self, rhs: jax.Array, dx: jax.Array, train: bool = False):
        """rhs: (B, *spatial, 1) with 1-3 spatial dims (the reference's N-D
        support, `Homogeneous_Poisson_NN.py:150-188`); dx: (B, 1|nd)."""
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else rhs.dtype
        act = cfg.activation
        B = rhs.shape[0]
        grid_shape = rhs.shape[1:-1]
        nd = len(grid_shape)
        if dx.shape[-1] == 1:
            dx2 = jnp.broadcast_to(dx, (B, nd))
        else:
            dx2 = dx
        domain_sizes = compute_domain_sizes(dx2, grid_shape)

        raw_rhs = rhs
        if cfg.normalize_rhs_max_magnitude:
            rhs, _ = _safe_unit_peak(rhs)

        x = rhs.astype(dtype)
        if cfg.use_positional_embeddings:
            pos = cos_position_embeddings(grid_shape, dtype=dtype)
            pos = jnp.broadcast_to(pos[None], (B,) + pos.shape)
            x = jnp.concatenate([x, pos], axis=-1)

        # pre-bottleneck conv stack
        for f, k in zip(cfg.pre_filters, cfg.pre_kernel_sizes):
            x = PadConv(f, k, act, cfg.pre_padding_mode, dtype=dtype)(x)
            if cfg.use_batchnorm:
                x = norm_layer(dtype)(x)

        # multi-resolution branches (skip factors too large for the grid)
        # remat: `train` is omitted from rematted calls (it only gates the
        # stateless norm layers, which ignore it) so no static args are needed
        block_cls = (
            nn.remat(BottleneckBlock) if cfg.remat_branches else BottleneckBlock
        )
        # explicit names = the plain auto-names, so parameters are
        # interchangeable between remat and non-remat configurations.
        # branch_index advances on every enumeration position, INCLUDING
        # skipped branches, so a branch's name is shape-independent: params
        # initialized at one grid shape apply at any other even when a config
        # interleaves small resize factors after large deconv factors
        branch_index = 0
        branch_results = []
        for ds, dk, ck in zip(
            cfg.deconv_downsampling_factors,
            cfg.deconv_kernel_sizes,
            cfg.deconv_conv_kernel_sizes,
        ):
            branch_index += 1
            if min(grid_shape) < 2 * ds:
                continue
            branch_results.append(
                block_cls(
                    downsampling_factor=ds,
                    filters=cfg.bottleneck_filters,
                    conv_kernel_size=ck,
                    n_convs=cfg.bottleneck_n_convs,
                    upsample_mode="deconv",
                    deconv_kernel_size=dk,
                    downsampling_method="pool",
                    pool_downsampling_method="average",
                    conv_activation=cfg.bottleneck_activation,
                    use_resnet=cfg.bottleneck_use_resnet,
                    use_batchnorm=cfg.use_batchnorm,
                    padding_mode="symmetric",
                    name=f"BottleneckBlock_{branch_index - 1}",
                )(x)
            )
        for ds, ck, rm in zip(
            cfg.resize_downsampling_factors,
            cfg.resize_conv_kernel_sizes,
            cfg.resize_methods,
        ):
            branch_index += 1
            if min(grid_shape) < 2 * ds:
                continue
            branch_results.append(
                block_cls(
                    downsampling_factor=ds,
                    filters=cfg.bottleneck_filters,
                    conv_kernel_size=ck,
                    n_convs=cfg.bottleneck_n_convs,
                    upsample_mode="resize",
                    resize_method=rm,
                    downsampling_method="pool",
                    pool_downsampling_method="average",
                    conv_activation=cfg.bottleneck_activation,
                    use_resnet=cfg.bottleneck_use_resnet,
                    use_batchnorm=cfg.use_batchnorm,
                    padding_mode="constant",
                    name=f"BottleneckBlock_{branch_index - 1}",
                )(x)
            )
        non_bottleneck = PadConv(cfg.bottleneck_filters, 5, "leaky_relu", dtype=dtype)(x)
        if branch_results:
            merged = sum(branch_results) / float(
                len(branch_results) * cfg.bottleneck_filters
            )
        else:
            merged = non_bottleneck
        out = jnp.concatenate([non_bottleneck, merged], axis=-1)
        out = PadConv(cfg.bottleneck_filters, 7, "leaky_relu", dtype=dtype)(out)
        out = ResNetBlock(cfg.bottleneck_filters, 7, "leaky_relu", dtype=dtype)(
            out, train=train
        )

        # dx-MLP channel modulation
        dense_inp = jnp.concatenate([dx2, domain_sizes], axis=-1).astype(dtype)
        h = dense_inp
        for u in cfg.dx_mlp_units:
            h = resolve_activation("leaky_relu")(nn.Dense(u, dtype=dtype)(h))
        h = nn.Dense(cfg.bottleneck_filters, dtype=dtype)(h)  # linear
        out = out * h.reshape((B,) + (1,) * nd + (-1,))

        # final conv stack
        n_final = len(cfg.final_filters)
        n_pairs = n_final - cfg.final_regular_conv_stages
        for i in range(n_pairs):
            f, k = cfg.final_filters[i], cfg.final_kernel_sizes[i]
            out = PadConv(f, k, cfg.final_activation, dtype=dtype)(out)
            out = ResNetBlock(f, k, cfg.final_activation, dtype=dtype)(out, train=train)
        for i in range(n_pairs, n_final):
            out = PadConv(
                cfg.final_filters[i], cfg.final_kernel_sizes[i], "linear", dtype=dtype
            )(out)

        if cfg.use_scaling:
            out = Scaling()(out, rhs.astype(dtype))

        # BC enforcement: crop the border, re-pad (zero = Dirichlet, symmetric
        # = Neumann) — `Homogeneous_Poisson_NN_Legacy.py:106-113,251`.
        inner = out[(slice(None),) + (slice(1, -1),) * nd + (slice(None),)]
        pad_cfg = ((0, 0),) + ((1, 1),) * nd + ((0, 0),)
        if cfg.bc_type == "dirichlet":
            out = jnp.pad(inner, pad_cfg)
        else:
            out = jnp.pad(inner, pad_cfg, mode="symmetric")

        out = out.astype(rhs.dtype)
        if cfg.postsmoother_iterations > 0:
            out = JacobiIterationLayer(cfg.postsmoother_iterations)(out, rhs, dx2)

        # output scaling modes (reference `Homogeneous_Poisson_NN.py:124-188`)
        mode = cfg.output_scaling
        if mode == "soln_max_magnitude":
            out = set_max_magnitude_in_batch(out, 1.0, eps=1e-30)
        elif mode is not None:
            factors = jnp.ones((B,), dtype=out.dtype)
            if "rhs_max_magnitude" in mode:
                factors = factors * peak_magnitudes(raw_rhs)
            if "max_domain_size_squared" in mode:
                factors = factors * jnp.max(domain_sizes, axis=1) ** 2
            if mode == "match_peak_laplacian_magnitude_to_peak_rhs":
                lap = apply_fd_operator(out, dx2, 5, 2)
                factors = peak_magnitudes(raw_rhs) / (
                    peak_magnitudes(lap) + 1e-30
                )
            out = out * factors.reshape((B,) + (1,) * (nd + 1))
        return out
