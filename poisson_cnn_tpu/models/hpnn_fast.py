"""HPNN-Fast — FLOP-reduced homogeneous-BC Poisson solver for production
inference (same task/API as `HPNN`: input [rhs (B,H,W,1), dx (B,1|2)] ->
solution (B,H,W,1), variable grids, Dirichlet/Neumann crop-repad BCs,
reference output-scaling modes).

Why it is fast (TPU-first redesign, not a translation): the reference's HPNN
(`poisson_CNN/models/Homogeneous_Poisson_NN_Legacy.py:86-96`) spends most of
its ~322 GFLOP/solve (256^2) on 15x15/13x13 dense convs at FULL resolution.
But the Poisson solution is spectrally smoother than its RHS (u_hat =
f_hat/|k|^2 — high frequencies are suppressed quadratically), so nearly all
capacity can live at reduced resolution:

  * a thin separable (kx1 + 1xk) stem/head at full resolution (bandwidth-
    bound, ~k/2x fewer FLOPs than dense kxk);
  * a multi-scale encoder/decoder pyramid doing the real work at 1/2..1/32
    resolution, where dense 5x5 convs with wide channels are nearly free;
  * dx-conditioning by FiLM modulation at every scale (the flagship's dx-MLP
    channel modulation, applied multi-scale);
  * bilinear/bicubic upsampling as precomputed interpolation matmuls (MXU),
    never gathers;
  * bf16 compute end-to-end; all shapes static per compile (variable grids =
    bucketed recompiles, same policy as HPNN).

~1.9 GFLOP/solve at 256^2 — a ~170x FLOP cut vs the flagship — and BETTER
accuracy: 3.6% mean rel-L2 vs the flagship demo's 7.1% on the identical
`evaluation.evaluate_hpnn` protocol (checkpoints/hpnn_fast/eval.json, trained
by scripts/train_hpnn_fast.py).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    apply_fd_operator,
    compute_domain_sizes,
    cos_position_embeddings,
    peak_magnitudes,
    resize_align_corners,
    set_max_magnitude_in_batch,
)
from ..layers import JacobiIterationLayer, PadConv, norm_layer
from ..utils import resolve_activation


@dataclasses.dataclass(frozen=True)
class HPNNFastConfig:
    # fold rxr spatial blocks into channels before the stem (and invert by
    # subpixel projection at the head). TPU-critical: convs at 256^2 with <16
    # channels waste almost the whole MXU (lanes pad to 128); at r=2 the same
    # math runs at 128^2 with 4x channels. 1 disables.
    input_space_to_depth: int = 2
    stem_filters: int = 16
    stem_kernel_size: int = 9
    # pyramid below the stem resolution; one entry per scale
    scale_filters: Tuple[int, ...] = (32, 48, 64, 64)
    scale_kernel_size: int = 5
    convs_per_scale: int = 2
    head_filters: int = 16
    head_kernel_size: int = 9
    dx_mlp_units: Tuple[int, ...] = (64, 64)
    activation: str = "leaky_relu"
    use_norm: bool = True  # GroupNorm on pyramid scales (not the full-res path)
    use_positional_embeddings: bool = True
    bc_type: str = "dirichlet"  # 'dirichlet' | 'neumann'
    postsmoother_iterations: int = 0
    dtype: Optional[str] = "bfloat16"
    normalize_rhs_max_magnitude: bool = False
    output_scaling: Optional[str] = None  # same modes as HPNNConfig
    # True (default): exact-multiple grids pad up a full block so the zero
    # margin the trunk learned from 32k+1 training shapes is always present
    # (see _pad_to_multiple; required for every pre-round-4 checkpoint).
    # False: exact multiples run unpadded — ONLY for checkpoints trained with
    # shape jitter (both pad regimes in the training mix), which buys back the
    # ~27% padding overhead on bench-style power-of-two grids.
    force_pad_margin: bool = True

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


class SeparableConv(nn.Module):
    """Spatially separable conv: one (1,..,k,..,1) conv per spatial dim, full
    channel mixing in each (kx1 + 1xk in 2-D; kx1x1 + 1xkx1 + 1x1xk in 3-D —
    the FLOP saving grows with rank: ~k^(d-1)/d vs a dense k^d kernel)."""

    features: int
    kernel_size: int
    activation: str = "linear"
    padding_mode: str = "constant"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel_size
        nd = x.ndim - 2
        for dim in range(nd):
            ks = tuple(k if i == dim else 1 for i in range(nd))
            x = PadConv(self.features, ks, "linear", self.padding_mode, dtype=self.dtype)(x)
        return resolve_activation(self.activation)(x)


class FiLM(nn.Module):
    """Per-channel scale/shift from a conditioning vector: x*(1+g) + b."""

    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, cond):
        c = x.shape[-1]
        nd = x.ndim - 2
        gb = nn.Dense(2 * c, dtype=self.dtype, kernel_init=nn.initializers.zeros_init())(cond)
        g, b = jnp.split(gb, 2, axis=-1)
        bshape = (x.shape[0],) + (1,) * nd + (c,)
        return x * (1.0 + g.reshape(bshape)) + b.reshape(bshape)


def _pad_to_multiple(x: jax.Array, mult: int, force_margin: bool = True):
    """Zero-pad spatial dims of (B,*spatial,C) up to a multiple of `mult`,
    by default ALWAYS leaving at least one padded cell per dim.

    The zero margin is part of the trained models' boundary encoding: training
    shapes (32k+1 lattices) always produce a margin, and the trunk learns to
    read the data->zeros transition as the domain edge. Without the guarantee,
    exact-multiple grids (64/96/128/256...) are silently out-of-distribution —
    measured 62-92%% rel-L2 vs 1-9%% with the margin (same checkpoint, same
    data; see checkpoints/even_grid_fix.json). Exact-multiple inputs therefore
    pad up a full extra block; that is the price of shape-independent
    correctness, paid only on multiple-sized grids. Models trained with shape
    jitter (marginless multiples in the training mix) may pass
    force_margin=False to run exact multiples unpadded."""
    spatial = x.shape[1:-1]
    if mult == 1:
        return x, spatial
    padded = tuple(
        (s // mult + 1) * mult if (s % mult == 0 and force_margin)
        else -(-s // mult) * mult
        for s in spatial
    )
    pads = ((0, 0),) + tuple((0, p - s) for s, p in zip(spatial, padded)) + ((0, 0),)
    return jnp.pad(x, pads), spatial


def space_to_depth(x: jax.Array, r: int) -> jax.Array:
    """(B,*spatial,C) -> (B,*spatial/r,r^nd*C) by folding r^nd blocks into
    channels (N-D generalization; 2-D layout unchanged)."""
    B, C = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    nd = len(sp)
    split = (B,) + sum(((s // r, r) for s in sp), ()) + (C,)
    x = x.reshape(split)
    perm = [0] + [1 + 2 * i for i in range(nd)] + [2 + 2 * i for i in range(nd)] + [1 + 2 * nd]
    x = x.transpose(perm)
    return x.reshape((B,) + tuple(s // r for s in sp) + (r**nd * C,))


def depth_to_space(x: jax.Array, r: int) -> jax.Array:
    """Inverse of `space_to_depth` (subpixel projection)."""
    B, C = x.shape[0], x.shape[-1]
    sp = x.shape[1:-1]
    nd = len(sp)
    c = C // r**nd
    x = x.reshape((B,) + sp + (r,) * nd + (c,))
    perm = [0]
    for i in range(nd):
        perm += [1 + i, 1 + nd + i]
    perm += [1 + 2 * nd]
    x = x.transpose(perm)
    return x.reshape((B,) + tuple(s * r for s in sp) + (c,))


class HPNNFast(nn.Module):
    cfg: HPNNFastConfig = HPNNFastConfig()

    @nn.compact
    def __call__(self, rhs: jax.Array, dx: jax.Array, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else rhs.dtype
        act = resolve_activation(cfg.activation)
        B = rhs.shape[0]
        spatial = rhs.shape[1:-1]
        nd = len(spatial)
        ones = (1,) * nd
        dx2 = jnp.broadcast_to(dx, (B, nd)) if dx.shape[-1] == 1 else dx
        domain_sizes = compute_domain_sizes(dx2, spatial)

        raw_rhs = rhs
        if cfg.normalize_rhs_max_magnitude:
            peaks = peak_magnitudes(rhs)
            rhs = rhs / jnp.where(peaks > 0, peaks, 1.0).reshape((B,) + ones + (1,))

        x = rhs.astype(dtype)
        if cfg.use_positional_embeddings:
            pos = cos_position_embeddings(spatial, dtype=dtype)
            x = jnp.concatenate([x, jnp.broadcast_to(pos[None], (B,) + pos.shape)], -1)

        n_scales = len(cfg.scale_filters)
        r = max(1, int(cfg.input_space_to_depth))
        x, _ = _pad_to_multiple(x, r * 2 ** n_scales, cfg.force_pad_margin)
        if r > 1:
            x = space_to_depth(x, r)

        # dx-conditioning trunk (shared; per-scale FiLM heads)
        cond = jnp.concatenate(
            [dx2, domain_sizes, 1.0 / (domain_sizes ** 2 + 1e-30)], axis=-1
        ).astype(dtype)
        for u in cfg.dx_mlp_units:
            cond = act(nn.Dense(u, dtype=dtype)(cond))

        # full-resolution separable stem
        stem = SeparableConv(
            cfg.stem_filters, cfg.stem_kernel_size, cfg.activation, dtype=dtype
        )(x)

        # encoder: strided-conv downsample + dense convs per scale
        skips = []
        h = stem
        for f in cfg.scale_filters:
            h = nn.Conv(f, (2,) * nd, strides=(2,) * nd, padding="VALID", dtype=dtype)(h)
            for _ in range(cfg.convs_per_scale):
                h = PadConv(f, cfg.scale_kernel_size, "linear", dtype=dtype)(h)
                if cfg.use_norm:
                    h = norm_layer(dtype)(h)
                h = act(h)
            h = FiLM(dtype=dtype)(h, cond)
            skips.append(h)

        # decoder: upsample-to-skip-shape (matmul resize) + merge + conv
        h = skips[-1]
        for skip in reversed(skips[:-1]):
            up = resize_align_corners(h, skip.shape[1:-1], "bilinear")
            h = nn.Conv(skip.shape[-1], ones, dtype=dtype)(
                jnp.concatenate([up, skip], axis=-1)
            )
            h = PadConv(skip.shape[-1], cfg.scale_kernel_size, "linear", dtype=dtype)(h)
            if cfg.use_norm:
                h = norm_layer(dtype)(h)
            h = act(h)
            h = FiLM(dtype=dtype)(h, cond)

        # full-resolution separable head
        up = resize_align_corners(h, stem.shape[1:-1], "bilinear")
        out = jnp.concatenate([up, stem], axis=-1)
        out = SeparableConv(
            cfg.head_filters, cfg.head_kernel_size, cfg.activation, dtype=dtype
        )(out)
        out = FiLM(dtype=dtype)(out, cond)
        out = SeparableConv(
            cfg.head_filters, cfg.head_kernel_size, cfg.activation, dtype=dtype
        )(out)
        out = nn.Conv(r**nd, ones, dtype=dtype)(out)
        if r > 1:
            out = depth_to_space(out, r)
        out = out[(slice(None),) + tuple(slice(0, s) for s in spatial) + (slice(None),)]

        # BC enforcement by crop-and-repad (same as HPNN:
        # `Homogeneous_Poisson_NN_Legacy.py:106-113,251`)
        border = ((0, 0),) + ((1, 1),) * nd + ((0, 0),)
        inner = out[(slice(None),) + (slice(1, -1),) * nd + (slice(None),)]
        if cfg.bc_type == "dirichlet":
            out = jnp.pad(inner, border)
        else:
            out = jnp.pad(inner, border, mode="symmetric")

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
                factors = peak_magnitudes(raw_rhs) / (peak_magnitudes(lap) + 1e-30)
            out = out * factors.reshape((B,) + ones + (1,))
        return out


#: default trained-checkpoint config location, relative to the repo root that
#: contains this package (checkpoints/ is a sibling of poisson_cnn_tpu/).
_DEFAULT_FAST_CONFIG = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "checkpoints", "hpnn_fast", "config.json",
)


def load_fast_config(path: Optional[str] = None) -> HPNNFastConfig:
    """Config of a trained fast checkpoint if present, else defaults.

    Resolution order: explicit `path` argument > `POISSON_CNN_TPU_FAST_CONFIG`
    env var > package-relative default (../checkpoints/hpnn_fast/config.json).
    Use `loaded_fast_config_path()` to see which file (if any) was read.
    """
    if path is None:
        path = os.environ.get("POISSON_CNN_TPU_FAST_CONFIG", _DEFAULT_FAST_CONFIG)
    if os.path.exists(path):
        with open(path) as f:
            d = json.load(f)
        for k in ("scale_filters", "dx_mlp_units"):
            if k in d:
                d[k] = tuple(d[k])
        return HPNNFastConfig(**d)
    return HPNNFastConfig()


def loaded_fast_config_path(path: Optional[str] = None) -> Optional[str]:
    """The config file `load_fast_config` would read, or None (defaults)."""
    if path is None:
        path = os.environ.get("POISSON_CNN_TPU_FAST_CONFIG", _DEFAULT_FAST_CONFIG)
    return path if os.path.exists(path) else None
