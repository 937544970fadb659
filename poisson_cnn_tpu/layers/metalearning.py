"""Metalearning (hypernetwork) conv layers: an MLP maps per-sample grid
information (dx, domain shape) to convolution kernels applied per sample.

Capability parity with `poisson_CNN/layers/metalearning_conv.py:52-169` and
`metalearning_deconvupscale.py:40-137`. The reference applies per-sample kernels
with a `tf.map_fn` Python loop over the batch — the worst case for a TPU. Here
the conv is computed in implicit-GEMM form: extract image patches once
(`lax.conv_general_dilated_patches`, a plain XLA conv with an identity kernel),
then contract patches against the batch of generated kernels with a single
batched matmul (`jnp.einsum 'bhwf,bfo->bhwo'`) that rides the MXU. The
transposed variant zero-dilates the input and applies the same patch-matmul with
a spatially flipped kernel.
"""

from __future__ import annotations

from typing import Callable, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from ..utils import resolve_activation
from .core import pad_spatial, norm_layer


def _patches(x: jax.Array, ks, strides, dilation=None) -> jax.Array:
    """Extract VALID patches of NHWC input; output (B, *spatial', Cin*prod(ks))
    with feature ordering (Cin-major, then row-major spatial offsets)."""
    nd = x.ndim - 2
    specs = {
        1: ("NHC", "OIH", "NHC"),
        2: ("NHWC", "OIHW", "NHWC"),
        3: ("NDHWC", "OIDHW", "NDHWC"),
    }
    return jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=tuple(ks),
        window_strides=tuple(strides),
        padding="VALID",
        rhs_dilation=None if dilation is None else tuple(dilation),
        dimension_numbers=specs[nd],
    )


def per_sample_conv(
    x: jax.Array,
    kernels: jax.Array,
    biases: jax.Array | None = None,
    strides=None,
    padding_mode: str = "constant",
    constant_padding_value: float = 0.0,
    dilation=None,
) -> jax.Array:
    """Convolution with a different kernel per sample, as patches + batched GEMM.

    x: (B, *spatial, Cin). kernels: (B, Cin, *ks, Cout). biases: (B, Cout).
    SAME-size output via the boundary padding mode.
    """
    nd = x.ndim - 2
    B, cin = x.shape[0], x.shape[-1]
    ks = kernels.shape[2 : 2 + nd]
    cout = kernels.shape[-1]
    strides = (1,) * nd if strides is None else tuple(strides)
    eff_ks = ks if dilation is None else tuple(
        (k - 1) * d + 1 for k, d in zip(ks, dilation)
    )
    pads = [((k - 1) // 2, k // 2) for k in eff_ks]
    xp = pad_spatial(x, pads, padding_mode, constant_padding_value)
    p = _patches(xp, ks, strides, dilation)  # (B, *sp', Cin*prod(ks))
    w = kernels.reshape(B, cin * int(np.prod(ks)), cout)
    out = jnp.einsum("b...f,bfo->b...o", p, w)
    if biases is not None:
        out = out + biases.reshape((B,) + (1,) * nd + (cout,))
    return out


def per_sample_conv_transpose(
    x: jax.Array,
    kernels: jax.Array,
    biases: jax.Array | None = None,
    stride: int = 2,
    out_shape: Tuple[int, ...] | None = None,
) -> jax.Array:
    """Transposed convolution with per-sample kernels: zero-dilate the input by
    `stride`, full-pad, then correlate with the spatially flipped kernel via the
    same patch-GEMM. Output center-cropped / zero-padded to `out_shape`
    (default: input_shape * stride).

    x: (B, *spatial, Cin). kernels: (B, Cin, *ks, Cout).
    """
    nd = x.ndim - 2
    B, cin = x.shape[0], x.shape[-1]
    ks = kernels.shape[2 : 2 + nd]
    cout = kernels.shape[-1]
    if out_shape is None:
        out_shape = tuple(s * stride for s in x.shape[1 : 1 + nd])
    # zero-dilation: (n-1)*stride + 1 points
    dil_shape = tuple((s - 1) * stride + 1 for s in x.shape[1 : 1 + nd])
    xd = jnp.zeros((B,) + dil_shape + (cin,), dtype=x.dtype)
    idx = (slice(None),) + tuple(slice(None, None, stride) for _ in range(nd)) + (slice(None),)
    xd = xd.at[idx].set(x)
    # full correlation with flipped kernel == transposed conv
    flip_axes = tuple(range(2, 2 + nd))
    kflip = jnp.flip(kernels, axis=flip_axes)
    pads = [(k - 1, k - 1) for k in ks]
    xp = pad_spatial(xd, pads, "constant", 0.0)
    p = _patches(xp, ks, (1,) * nd)
    w = kflip.reshape(B, cin * int(np.prod(ks)), cout)
    y = jnp.einsum("b...f,bfo->b...o", p, w)  # (B, dil+k-1, ..., Cout)
    # center-crop / pad to out_shape
    slices = [slice(None)]
    pad_cfg = [(0, 0)]
    for k in range(nd):
        have, want = y.shape[1 + k], int(out_shape[k])
        if have >= want:
            off = (have - want) // 2
            slices.append(slice(off, off + want))
            pad_cfg.append((0, 0))
        else:
            slices.append(slice(None))
            lo = (want - have) // 2
            pad_cfg.append((lo, want - have - lo))
    slices.append(slice(None))
    pad_cfg.append((0, 0))
    y = jnp.pad(y[tuple(slices)], pad_cfg)
    if biases is not None:
        y = y + biases.reshape((B,) + (1,) * nd + (cout,))
    return y


class KernelHypernetwork(nn.Module):
    """MLP producing per-sample conv kernels (+ bias) from dense grid features
    (reference `metalearning_conv.py:125-133`)."""

    kernel_shape: Tuple[int, ...]  # (Cin, *ks, Cout)
    hidden_units: Tuple[int, ...] = (8, 16)
    activation: str | Callable = "leaky_relu"
    use_layernorm: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, dense_inp: jax.Array):
        act = resolve_activation(self.activation)
        h = dense_inp
        for u in self.hidden_units:
            h = act(nn.Dense(u)(h))
            if self.use_layernorm:
                h = nn.LayerNorm()(h)
        n_kernel = int(np.prod(self.kernel_shape))
        cout = self.kernel_shape[-1]
        n_out = n_kernel + (cout if self.use_bias else 0)
        flat = nn.Dense(
            n_out, kernel_init=nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal")
        )(h)
        # Scale the generated kernel by the *generated conv's* fan-in
        # (cin * prod(ks)) so a MetaConv has ~unit gain at init regardless of
        # kernel size/width.  Without this, each layer amplifies activations
        # by ~sqrt(cin*k^2)*entry_std and a 10-layer stack blows up to ~1e5
        # (round-5 zoo diagnosis: MetaHPNN init rel-L2 ~1.9e5).
        conv_fan_in = float(np.prod(self.kernel_shape[:-1]))
        kernels = flat[:, :n_kernel].reshape((-1,) + self.kernel_shape)
        kernels = kernels * (conv_fan_in ** -0.5)
        biases = 0.1 * flat[:, n_kernel:] if self.use_bias else None
        return kernels, biases


class MetaConv(nn.Module):
    """Hypernetwork convolution: [x, dense_inp] -> conv with generated kernels."""

    features: int
    kernel_size: Sequence[int] | int
    activation: str | Callable = "leaky_relu"
    padding_mode: str = "constant"
    constant_padding_value: float = 0.0
    strides: Sequence[int] | int = 1
    hidden_units: Tuple[int, ...] = (8, 16)
    use_layernorm: bool = True
    use_bias: bool = True
    dilation: Sequence[int] | int | None = None

    @nn.compact
    def __call__(self, x, dense_inp):
        nd = x.ndim - 2
        ks = (self.kernel_size,) * nd if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        strides = (self.strides,) * nd if isinstance(self.strides, int) else tuple(self.strides)
        dilation = None
        if self.dilation is not None:
            dilation = (self.dilation,) * nd if isinstance(self.dilation, int) else tuple(self.dilation)
        cin = x.shape[-1]
        kernels, biases = KernelHypernetwork(
            (cin,) + ks + (self.features,),
            self.hidden_units,
            self.activation,
            self.use_layernorm,
            self.use_bias,
        )(dense_inp)
        out = per_sample_conv(
            x, kernels, biases, strides, self.padding_mode,
            self.constant_padding_value, dilation,
        )
        return resolve_activation(self.activation)(out)


class MetaDeconvUpscale(nn.Module):
    """Hypernetwork transposed-conv upsampling to an explicit output shape."""

    features: int
    kernel_size: Sequence[int] | int
    upsample_ratio: int
    activation: str | Callable = "linear"
    hidden_units: Tuple[int, ...] = (8, 16)
    use_layernorm: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, dense_inp, out_shape):
        nd = x.ndim - 2
        ks = (self.kernel_size,) * nd if isinstance(self.kernel_size, int) else tuple(self.kernel_size)
        cin = x.shape[-1]
        kernels, biases = KernelHypernetwork(
            (cin,) + ks + (self.features,),
            self.hidden_units,
            self.activation,
            self.use_layernorm,
            self.use_bias,
        )(dense_inp)
        out = per_sample_conv_transpose(
            x, kernels, biases, self.upsample_ratio, tuple(int(s) for s in out_shape)
        )
        return resolve_activation(self.activation)(out)


class MetaResNetBlock(nn.Module):
    """Residual block of MetaConvs: y = conv2(x + conv1(conv0(x)))
    (reference `blocks/metalearning_resnet.py:6-37`)."""

    features: int
    kernel_size: Sequence[int] | int
    activation: str | Callable = "leaky_relu"
    padding_mode: str = "constant"
    constant_padding_value: float = 0.0
    hidden_units: Tuple[int, ...] = (8, 16)
    use_batchnorm: bool = False

    @nn.compact
    def __call__(self, x, dense_inp, train: bool = False):
        conv = lambda: MetaConv(
            self.features, self.kernel_size, self.activation, self.padding_mode,
            self.constant_padding_value, hidden_units=self.hidden_units,
        )
        out = conv()(x, dense_inp)
        if self.use_batchnorm:
            out = norm_layer()(out)
        out = conv()(out, dense_inp)
        if self.use_batchnorm:
            out = norm_layer()(out)
        out = x + out
        return conv()(out, dense_inp)
