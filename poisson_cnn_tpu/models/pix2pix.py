"""Pix2Pix-style encoder-decoder generator baseline.

Capability parity with `poisson_CNN/models/pix2pix.py:43-106` (adapted from the
TF pix2pix tutorial generator): strided-conv downsampling stack with batchnorm +
leaky-relu, transposed-conv upsampling stack with skip connections, tanh-free
linear output head suited to regression. The reference ships no train script for
this model; it is a model-zoo baseline.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import DeconvUpscale, PadConv


@dataclasses.dataclass(frozen=True)
class Pix2PixConfig:
    encoder_filters: Tuple[int, ...] = (32, 64, 128, 256)
    decoder_filters: Tuple[int, ...] = (128, 64, 32, 16)
    kernel_size: int = 4
    out_channels: int = 1
    dtype: Optional[str] = None


class Pix2PixGenerator(nn.Module):
    cfg: Pix2PixConfig = Pix2PixConfig()

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else x.dtype
        h = x.astype(dtype)
        skips = []
        for f in cfg.encoder_filters:
            h = PadConv(f, cfg.kernel_size, "leaky_relu", strides=2, dtype=dtype)(h)
            skips.append(h)
        for f, skip in zip(cfg.decoder_filters, reversed(skips[:-1])):
            h = DeconvUpscale(f, cfg.kernel_size, 2, "relu", dtype=dtype)(
                h, skip.shape[1:3]
            )
            h = jnp.concatenate([h, skip], axis=-1)
        h = DeconvUpscale(cfg.out_channels, cfg.kernel_size, 2, "linear", dtype=dtype)(
            h, x.shape[1:3]
        )
        return h.astype(x.dtype)
