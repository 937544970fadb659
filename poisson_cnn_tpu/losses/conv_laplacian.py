"""Fixed-stencil convolutional Laplacian losses (incl. variable density).

Capability parity with `poisson_CNN/misc/conv_laplacian_loss.py:7-110`: an MSE
between the RHS and a fixed 5- or 9-point Laplacian of the prediction, plus the
variable-density variant div((1/rho) grad u). The 5-point path is the separable
operator already in `ops.fd`; the 9-point stencil is the standard compact
fourth-order-in-h form; variable density reuses the conservative face-flux
operator from `solvers.variable_density`.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import apply_fd_operator
from ..solvers.variable_density import variable_density_operator

# compact 9-point Laplacian stencil (times 1/(6 h^2) with dx = dy)
_NINE_POINT = np.array(
    [[1.0, 4.0, 1.0], [4.0, -20.0, 4.0], [1.0, 4.0, 1.0]]
) / 6.0


def laplacian_9pt(u: jax.Array, dx: jax.Array) -> jax.Array:
    """9-point Laplacian on the interior; requires dx == dy per sample.
    u: (B, n0, n1, C); dx: (B, 1). Returns (B, n0-2, n1-2, C)."""
    kern = jnp.asarray(_NINE_POINT, dtype=u.dtype).reshape(3, 3, 1, 1)
    out = jax.lax.conv_general_dilated(
        u, kern, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale = (1.0 / dx[:, 0] ** 2)[:, None, None, None].astype(u.dtype)
    return out * scale


def conv_laplacian_loss(
    rhs: jax.Array, prediction: jax.Array, dx: jax.Array, stencil: str = "5pt"
) -> jax.Array:
    """MSE between the interior RHS and the stencil Laplacian of the prediction."""
    if stencil == "5pt":
        lap = apply_fd_operator(prediction, dx, 3, 2)
    elif stencil == "9pt":
        lap = laplacian_9pt(prediction, dx)
    else:
        raise ValueError(f"unknown stencil {stencil}")
    return jnp.mean((rhs[:, 1:-1, 1:-1, :] - lap) ** 2)


def variable_density_loss(
    rhs: jax.Array, prediction: jax.Array, rho: jax.Array, dx: jax.Array
) -> jax.Array:
    """MSE residual of div((1/rho) grad prediction) = rhs on the interior."""
    op = variable_density_operator(prediction, rho, dx)
    return jnp.mean((rhs[:, 1:-1, 1:-1, :] - op) ** 2)
