"""Per-sample peak-magnitude utilities (mask-aware for padded/bucketed grids).

Reference semantics: `poisson_CNN/dataset/utils/set_max_magnitude.py:3-50` and
`poisson_CNN/utils/get_peak_magnitudes_in_each_sample.py:3-12`. The reference loops
per sample with tf.map_fn; here everything is a batched reduction (VPU-friendly),
with an optional mask so padded regions of bucketed variable-size grids are ignored.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _reduce_axes(arr: jax.Array):
    return tuple(range(1, arr.ndim))


def peak_magnitudes(arr: jax.Array, mask: jax.Array | None = None) -> jax.Array:
    """max |arr| per sample. arr: (B, ...). mask: broadcastable to arr, 1=valid.
    Returns (B,)."""
    a = jnp.abs(arr)
    if mask is not None:
        a = a * mask
    return jnp.max(a, axis=_reduce_axes(arr))


def set_max_magnitude_in_batch(
    arr: jax.Array, max_magnitude, mask: jax.Array | None = None, eps: float = 0.0
) -> jax.Array:
    """Scale each sample so its peak |value| equals max_magnitude."""
    out, _ = set_max_magnitude_in_batch_and_return_scaling_factors(
        arr, max_magnitude, mask=mask, eps=eps
    )
    return out


def set_max_magnitude_in_batch_and_return_scaling_factors(
    arr: jax.Array, max_magnitude, mask: jax.Array | None = None, eps: float = 0.0
):
    """Per-sample rescale to the target peak magnitude; also return the factors.

    Returns (scaled, factors) with factors shape (B,) such that
    scaled = arr * factors[:, None, ...].
    """
    peaks = peak_magnitudes(arr, mask=mask)
    max_magnitude = jnp.asarray(max_magnitude, dtype=arr.dtype)
    factors = max_magnitude / (peaks + eps)
    shaped = factors.reshape((-1,) + (1,) * (arr.ndim - 1))
    return arr * shaped, factors
