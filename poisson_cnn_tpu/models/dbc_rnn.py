"""DBC-RNN: recurrent boundary-to-interior network.

Capability parity with `poisson_CNN/models/Dirichlet_BC_RNN.py:7-77` (trained by
`train/dbcnn_rnn_train.py`, config `experiments/dbcnn_rnn.json`: 6 x 100-unit
LSTM): an LSTM/GRU stack scans along the boundary curve, the per-position
hidden features are expanded into a strip of x-direction profiles, and the
strip is bicubic-upsampled to the target 2-D shape. Recurrence uses flax's
nn.RNN (lax.scan under the hood — static-shape, TPU-compatible).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..layers import Upsample


@dataclasses.dataclass(frozen=True)
class DBCRNNConfig:
    hidden_size: int = 100
    n_layers: int = 6
    cell: str = "lstm"  # 'lstm' | 'gru'
    # x-profiles emitted per boundary position. The reference uses the last
    # RNN layer's units (100, `Dirichlet_BC_RNN.py:29-31` + the upsample at
    # :52-55) directly as this axis; 100 >= the largest trained H means the
    # bicubic expansion loses nothing. A 16-wide strip caps rel-L2 ~0.38:
    # exponential boundary-mode decay over 65-97 rows cannot be represented
    # by 16 cubic knots (round-5 zoo diagnosis).
    strip_width: int = 100
    resize_method: str = "bicubic"
    dtype: Optional[str] = None


class DBCRNN(nn.Module):
    cfg: DBCRNNConfig = DBCRNNConfig()

    @nn.compact
    def __call__(self, bc: jax.Array, dx: jax.Array, x_output_resolution: int,
                 train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype) if cfg.dtype else bc.dtype
        B, W, C = bc.shape
        # condition on grid geometry: the Laplace field's decay rate away from
        # the boundary is set by the domain aspect ratio, which the boundary
        # values alone cannot reveal (round-5 zoo fix: dx was accepted but
        # ignored, capping variable-grid accuracy ~40%)
        H = int(x_output_resolution)
        if dx.shape[-1] == 1:
            dx2 = jnp.broadcast_to(dx, (B, 2))
        else:
            dx2 = dx
        L = dx2 * jnp.array([[H - 1, W - 1]], dtype=dx2.dtype)
        geom = jnp.concatenate([dx2, L / jnp.max(L, axis=1, keepdims=True)], -1)
        geom = jnp.broadcast_to(geom[:, None, :], (B, W, 4)).astype(dtype)
        h = jnp.concatenate([bc.astype(dtype), geom], axis=-1)
        for i in range(cfg.n_layers):
            cell = (
                nn.OptimizedLSTMCell(cfg.hidden_size, dtype=dtype)
                if cfg.cell == "lstm"
                else nn.GRUCell(cfg.hidden_size, dtype=dtype)
            )
            # alternate scan direction per layer: the Laplace field at column
            # w depends on the WHOLE boundary, but a unidirectional scan (the
            # reference's keras LSTM default, Dirichlet_BC_RNN.py:29-31) lets
            # position w see only bc[0..w] — a hard accuracy cap on the left
            # half of the domain (round-5 zoo diagnosis). Two alternating
            # layers give every position full-boundary receptive field.
            h = nn.RNN(cell, reverse=bool(i % 2), keep_order=True)(h)
        strip = nn.Dense(cfg.strip_width, dtype=dtype)(
            jnp.concatenate([h, geom], axis=-1)
        )  # (B, W, strip)
        strip = jnp.swapaxes(strip, 1, 2)[..., None]  # (B, strip, W, 1)
        out = Upsample(cfg.resize_method)(strip, (H, W))
        out = out.astype(bc.dtype)
        # re-impose the boundary row like the DBCNN
        return jnp.concatenate([bc[:, None, :, :], out[:, 1:, :, :]], axis=1)
