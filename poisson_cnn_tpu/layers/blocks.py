"""Bottleneck blocks: downsample -> conv stack -> upsample back.

Capability parity with `poisson_CNN/blocks/bottleneck_block.py:8-118` (plain) and
`poisson_CNN/blocks/metalearning_bottleneck_block.py:8-191` (hypernetwork):
a branch at downsampling factor d pools/strides the input down, applies n convs
(optionally residual blocks), and upsamples back to (in_shape/d)*u — the
multi-resolution pyramid that gives the HPNN its large receptive field.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import flax.linen as nn

from .core import PadConv, ResNetBlock, Upsample, DeconvUpscale, norm_layer
from .metalearning import MetaConv, MetaResNetBlock, MetaDeconvUpscale


def _pool(x, factor: int, method: str):
    window = (factor,) * (x.ndim - 2)
    if method in ("average", "avg"):
        return nn.avg_pool(x, window, strides=window, padding="SAME")
    return nn.max_pool(x, window, strides=window, padding="SAME")


def _out_shape(in_shape, ds: int, us: float):
    return tuple(int(s / ds * us) for s in in_shape)


class BottleneckBlock(nn.Module):
    """Plain bottleneck branch.

    upsample_mode: 'resize' (multilinear/bicubic align-corners resize — the
    reference's `bottleneck_block_multilinearupsample`) or 'deconv' (learnable
    transposed conv — `bottleneck_block_deconvupsample`).
    """

    downsampling_factor: int
    filters: int
    conv_kernel_size: int
    n_convs: int = 1
    upsampling_factor: Optional[int] = None
    upsample_mode: str = "resize"
    resize_method: str = "bilinear"
    deconv_kernel_size: Optional[int] = None
    downsampling_method: str = "pool"  # 'pool' | 'conv'
    pool_downsampling_method: str = "max"
    conv_downsampling_kernel_size: Optional[int] = None
    conv_activation: str | Callable = "linear"
    use_resnet: bool = False
    use_batchnorm: bool = False
    padding_mode: str = "constant"
    constant_padding_value: float = 0.0

    @nn.compact
    def __call__(self, x, train: bool = False):
        ds = self.downsampling_factor
        us = self.upsampling_factor if self.upsampling_factor is not None else ds
        in_shape = x.shape[1:-1]
        out = x
        n_convs = self.n_convs
        if self.downsampling_method == "conv":
            out = PadConv(
                self.filters,
                self.conv_downsampling_kernel_size or self.conv_kernel_size,
                self.conv_activation, self.padding_mode,
                self.constant_padding_value, strides=ds,
            )(out)
        else:
            out = _pool(out, ds, self.pool_downsampling_method)
            if self.use_resnet:
                # resnet blocks preserve channel count; lift channels first
                out = PadConv(
                    self.filters, self.conv_kernel_size, self.conv_activation,
                    self.padding_mode, self.constant_padding_value,
                )(out)
                n_convs -= 1
        for _ in range(max(n_convs, 0)):
            if self.use_resnet:
                out = ResNetBlock(
                    self.filters, self.conv_kernel_size, self.conv_activation,
                    self.padding_mode, self.constant_padding_value,
                    use_batchnorm=self.use_batchnorm,
                )(out, train=train)
            else:
                out = PadConv(
                    self.filters, self.conv_kernel_size, self.conv_activation,
                    self.padding_mode, self.constant_padding_value,
                )(out)
                if self.use_batchnorm:
                    out = norm_layer()(out)
        target = _out_shape(in_shape, ds, us)
        if self.upsample_mode == "deconv":
            out = DeconvUpscale(
                self.filters, self.deconv_kernel_size or ds, us,
            )(out, target)
        else:
            out = Upsample(self.resize_method)(out, target)
        return out


class MetaBottleneckBlock(nn.Module):
    """Hypernetwork bottleneck branch: all convs take [x, dense_inp]."""

    downsampling_factor: int
    filters: int
    conv_kernel_size: int
    n_convs: int = 1
    upsampling_factor: Optional[int] = None
    upsample_mode: str = "deconv"  # 'deconv' | 'resize'
    resize_method: str = "bilinear"
    deconv_kernel_size: Optional[int] = None
    downsampling_method: str = "pool"
    pool_downsampling_method: str = "max"
    conv_downsampling_kernel_size: Optional[int] = None
    conv_activation: str | Callable = "leaky_relu"
    use_resnet: bool = False
    use_batchnorm: bool = False
    padding_mode: str = "constant"
    constant_padding_value: float = 0.0
    hidden_units: Tuple[int, ...] = (8, 16)

    @nn.compact
    def __call__(self, x, dense_inp, train: bool = False):
        ds = self.downsampling_factor
        us = self.upsampling_factor if self.upsampling_factor is not None else ds
        in_shape = x.shape[1:-1]
        out = x
        n_convs = self.n_convs
        if self.downsampling_method == "conv":
            out = MetaConv(
                self.filters,
                self.conv_downsampling_kernel_size or self.conv_kernel_size,
                self.conv_activation, self.padding_mode,
                self.constant_padding_value, strides=ds,
                hidden_units=self.hidden_units,
            )(out, dense_inp)
        else:
            out = _pool(out, ds, self.pool_downsampling_method)
            if self.use_resnet:
                out = MetaConv(
                    self.filters, self.conv_kernel_size, self.conv_activation,
                    self.padding_mode, self.constant_padding_value,
                    hidden_units=self.hidden_units,
                )(out, dense_inp)
                n_convs -= 1
        for _ in range(max(n_convs, 0)):
            if self.use_resnet:
                out = MetaResNetBlock(
                    self.filters, self.conv_kernel_size, self.conv_activation,
                    self.padding_mode, self.constant_padding_value,
                    hidden_units=self.hidden_units,
                    use_batchnorm=self.use_batchnorm,
                )(out, dense_inp, train=train)
            else:
                out = MetaConv(
                    self.filters, self.conv_kernel_size, self.conv_activation,
                    self.padding_mode, self.constant_padding_value,
                    hidden_units=self.hidden_units,
                )(out, dense_inp)
                if self.use_batchnorm:
                    out = norm_layer()(out)
        target = _out_shape(in_shape, ds, us)
        if self.upsample_mode == "deconv":
            out = MetaDeconvUpscale(
                self.filters, self.deconv_kernel_size or ds, us,
                hidden_units=self.hidden_units,
            )(out, dense_inp, target)
        else:
            out = Upsample(self.resize_method)(out, target)
        return out
