"""Fourier-decoder autoencoder HPNN: conv encoder -> MLP -> per-dim sine-series
coefficients -> separable outer-product solution synthesis.

Capability parity with `poisson_CNN/models/Homogeneous_Poisson_NN_Autoencoder.py`
(`Homogeneous_Poisson_NN_AE_Decoder_Fourier` `:7-71`, model `:83-149`): the
reference uses a keras ResNet50V2 backbone; here a compact strided-conv encoder
(pretrained-backbone weights are meaningless for RHS fields anyway) feeds an MLP
that emits a (modes x modes) coefficient grid; the decoder synthesizes
u = sum_jk c_jk sin(j pi x_hat) sin(k pi y_hat) at ANY output resolution (the
basis is analytic — evaluated by the same MXU matmuls as the data engine), and
the output is max-magnitude normalized like the reference.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import set_max_magnitude_in_batch, synthesize_series
from ..layers import PadConv, spatial_pyramid_pool


@dataclasses.dataclass(frozen=True)
class FourierAutoencoderConfig:
    encoder_filters: Tuple[int, ...] = (16, 32, 64, 128)
    kernel_size: int = 3
    spp_levels: Tuple = ((2, 2), 4, 6)
    mlp_units: Tuple[int, ...] = (256, 256)
    n_modes: int = 24
    activation: str = "leaky_relu"
    normalize_output: bool = True
    dtype: Optional[str] = None


class FourierAutoencoderHPNN(nn.Module):
    cfg: FourierAutoencoderConfig = FourierAutoencoderConfig()

    @nn.compact
    def __call__(self, rhs: jax.Array, dx: jax.Array, train: bool = False,
                 out_shape: Optional[Tuple[int, int]] = None):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else rhs.dtype
        B, H, W, _ = rhs.shape
        if out_shape is None:
            out_shape = (H, W)
        h = rhs.astype(dtype)
        for f in cfg.encoder_filters:
            h = PadConv(f, cfg.kernel_size, cfg.activation, strides=2, dtype=dtype)(h)
        feats = spatial_pyramid_pool(h, cfg.spp_levels)
        feats = jnp.concatenate([feats, dx.astype(dtype)], axis=-1)
        for u in cfg.mlp_units:
            feats = jax.nn.leaky_relu(nn.Dense(u, dtype=dtype)(feats))
        coeffs = nn.Dense(cfg.n_modes * cfg.n_modes, dtype=dtype)(feats)
        coeffs = coeffs.reshape(B, cfg.n_modes, cfg.n_modes)
        out = synthesize_series(coeffs, None, out_shape, dtype=dtype)[..., None]
        if cfg.normalize_output:
            out = set_max_magnitude_in_batch(out, 1.0, eps=1e-30)
        return out.astype(rhs.dtype)
