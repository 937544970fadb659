"""2-D rotation/flip utilities for NHWC fields.

Capability parity with `poisson_CNN/dataset/utils/flip_and_rotate_tensor.py:4-47`,
used by the combined PCNN model to map the Dirichlet-BC network's canonical-edge
prediction onto each of the four boundaries
(`poisson_CNN/models/Poisson_CNN_Legacy.py:32-45`). Implemented as plain
transpose + reverse on the two spatial axes of (B, H, W, C) tensors — XLA fuses
these into layout changes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rot90(x: jax.Array, k: int = 1) -> jax.Array:
    """Rotate the (H, W) spatial axes of an NHWC tensor by k*90 degrees
    counter-clockwise (numpy.rot90 convention on axes (1, 2))."""
    k = k % 4
    if k == 0:
        return x
    if k == 1:
        return jnp.flip(jnp.swapaxes(x, 1, 2), axis=1)
    if k == 2:
        return jnp.flip(jnp.flip(x, axis=1), axis=2)
    return jnp.flip(jnp.swapaxes(x, 1, 2), axis=2)


def flip(x: jax.Array, spatial_axis: int) -> jax.Array:
    """Flip along spatial axis 0 (H) or 1 (W) of an NHWC tensor."""
    return jnp.flip(x, axis=1 + spatial_axis)
