"""Grid geometry helpers: domain sizes, coordinates, positional embeddings.

Reference semantics: `poisson_CNN/dataset/utils/compute_domain_sizes.py:4-6`
(L = dx * (n-1)) and the cos(pi * linspace(0,1,n)) positional embeddings used by the
models (`poisson_CNN/models/Homogeneous_Poisson_NN_Legacy.py:172-180`). Layout here
is NHWC (TPU conv layout) rather than the reference's channels_first.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def compute_domain_sizes(dx: jax.Array, grid_shape) -> jax.Array:
    """Physical domain sizes L_k = dx_k * (n_k - 1).

    dx: (B, ndims) or (B, 1) per-sample spacings; grid_shape: static tuple of ints.
    Returns (B, ndims).
    """
    n = jnp.asarray(grid_shape, dtype=dx.dtype)
    if dx.shape[-1] == 1 and len(grid_shape) > 1:
        dx = jnp.broadcast_to(dx, dx.shape[:-1] + (len(grid_shape),))
    return dx * (n - 1.0)


def unit_coordinates(n: int, dtype=jnp.float32) -> jax.Array:
    """linspace(0, 1, n) — the normalized coordinate convention used throughout."""
    return jnp.linspace(0.0, 1.0, n, dtype=dtype)


def cos_position_embeddings(grid_shape, dtype=jnp.float32) -> jax.Array:
    """cos(pi * x_hat) embeddings per spatial dim, stacked on a trailing channel axis.

    grid_shape: static tuple (n_0, ..., n_{d-1}). Returns (*grid_shape, ndims),
    ready to broadcast over the batch axis and concat with NHWC activations.
    """
    nd = len(grid_shape)
    comps = []
    for k, n in enumerate(grid_shape):
        c = jnp.cos(math.pi * unit_coordinates(n, dtype))
        shape = [1] * nd
        shape[k] = n
        comps.append(jnp.broadcast_to(c.reshape(shape), grid_shape))
    return jnp.stack(comps, axis=-1)


def make_shape_mask(grid_shape, true_shape, dtype=jnp.float32) -> jax.Array:
    """Mask for pad-and-bucket variable grids: 1 inside the per-sample true extent,
    0 in the padded region.

    grid_shape: static padded shape (n_0, ..., n_{d-1}).
    true_shape: (B, ndims) int array of actual extents (<= padded shape).
    Returns (B, *grid_shape, 1).
    """
    nd = len(grid_shape)
    masks = []
    for k, n in enumerate(grid_shape):
        idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)  # (1, n)
        m = (idx < true_shape[:, k : k + 1]).astype(dtype)  # (B, n)
        shape = [m.shape[0]] + [1] * nd
        shape[k + 1] = n
        masks.append(m.reshape(shape))
    out = masks[0]
    for m in masks[1:]:
        out = out * m
    return out[..., None]
