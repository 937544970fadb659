"""UNet baseline for Poisson solving on variable grids.

Capability parity with `poisson_CNN/models/UNet.py:1-329` (itself adapted from
jakeret/unet): encoder of conv blocks + max-pool, decoder of transposed-conv
upsampling with skip concatenation, trained on [rhs, dx] -> solution. The
reference uses dynamic-shape deconvs to support variable grids
(`UNet.py:246-253`); here variable grids are bucketed static shapes, and the
decoder's DeconvUpscale takes the encoder skip's exact shape so odd sizes work.
The dx conditioning follows the HPNN pattern (dx-MLP channel modulation), which
the reference's UNet lacks — it ignores dx entirely; we keep an option to match.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import DeconvUpscale, PadConv


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    depth: int = 4
    root_features: int = 16
    kernel_size: int = 3
    pool_size: int = 2
    activation: str = "relu"
    out_channels: int = 1
    use_dx_conditioning: bool = False
    dtype: Optional[str] = None


class ConvBlock(nn.Module):
    features: int
    kernel_size: int
    activation: str
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = PadConv(self.features, self.kernel_size, self.activation, dtype=self.dtype)(x)
        x = PadConv(self.features, self.kernel_size, self.activation, dtype=self.dtype)(x)
        return x


class UNet(nn.Module):
    cfg: UNetConfig = UNetConfig()

    @nn.compact
    def __call__(self, rhs: jax.Array, dx: jax.Array | None = None, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else rhs.dtype
        x = rhs.astype(dtype)
        skips = []
        feats = cfg.root_features
        for d in range(cfg.depth):
            x = ConvBlock(feats, cfg.kernel_size, cfg.activation, dtype)(x)
            skips.append(x)
            x = nn.max_pool(x, (cfg.pool_size,) * 2, strides=(cfg.pool_size,) * 2,
                            padding="SAME")
            feats *= 2
        x = ConvBlock(feats, cfg.kernel_size, cfg.activation, dtype)(x)
        if cfg.use_dx_conditioning and dx is not None:
            h = dx.astype(dtype)
            h = nn.Dense(32, dtype=dtype)(h)
            h = jax.nn.relu(h)
            h = nn.Dense(feats, dtype=dtype)(h)
            x = x * (1.0 + h[:, None, None, :])
        for d in reversed(range(cfg.depth)):
            feats //= 2
            skip = skips[d]
            x = DeconvUpscale(feats, cfg.pool_size, cfg.pool_size, dtype=dtype)(
                x, skip.shape[1:3]
            )
            x = jnp.concatenate([skip, x], axis=-1)
            x = ConvBlock(feats, cfg.kernel_size, cfg.activation, dtype)(x)
        out = PadConv(cfg.out_channels, 1, "linear", dtype=dtype)(x)
        return out.astype(rhs.dtype)
