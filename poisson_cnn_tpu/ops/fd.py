"""Finite-difference stencils and separable FD operators.

Capability parity with the reference's stencil machinery
(`poisson_CNN/dataset/utils/get_fd_coefficients.py:4-19`,
`poisson_CNN/dataset/utils/build_fd_coefficients.py:5-42`) but TPU-native in how the
operator is *applied*: instead of materialising a per-sample ndims-D cross-shaped
kernel and running one conv per sample (the reference's `tf.map_fn` pattern,
`poisson_CNN/losses/physics_informed_loss.py:34-44`), we exploit separability —
conv along each axis with a FIXED 1-D kernel (compiled once, fused by XLA), then
scale each axis term by the per-sample 1/dx_k^order and sum. This keeps all convs
static-shaped and batched for the MXU/VPU, and reduces the per-sample work to an
elementwise multiply.
"""

from __future__ import annotations

import math

import numpy as np
import jax
import jax.numpy as jnp


def fd_coefficients(stencil_positions, order: int) -> np.ndarray:
    """Finite-difference coefficients for a derivative of `order` at position 0.

    Solves the Vandermonde moment system for arbitrary integer stencil positions,
    with unit grid spacing. Mirrors the semantics of the reference's
    `get_fd_coefficients` (`poisson_CNN/dataset/utils/get_fd_coefficients.py:4-19`).
    """
    pos = np.asarray(sorted(stencil_positions), dtype=np.float64)
    n = len(pos)
    if order >= n:
        raise ValueError(f"order {order} needs a stencil with more than {n} points")
    vander = np.stack([pos**k for k in range(n)])  # (n, n): row k = pos^k
    rhs = np.zeros((n,), dtype=np.float64)
    rhs[order] = math.factorial(order)
    return np.linalg.solve(vander, rhs)


def fd_stencil_1d(stencil_size: int, order: int) -> np.ndarray:
    """Centered 1-D stencil of odd size `stencil_size` for derivative `order`."""
    if stencil_size % 2 != 1:
        raise ValueError("stencil sizes must be odd (symmetric stencils)")
    half = stencil_size // 2
    return fd_coefficients(range(-half, half + 1), order)


def build_fd_stencil(stencil_sizes, orders, ndims: int | None = None) -> np.ndarray:
    """ndims-D cross-shaped stencil: sum of per-axis 1-D stencils embedded into an
    ndims-D grid (reference: `build_fd_coefficients.py:5-42`). Returned with a
    leading axis of size ndims so each direction's contribution stays separate
    (needed for per-sample 1/dx_k^order scaling)."""
    if isinstance(stencil_sizes, int):
        if ndims is None:
            raise ValueError("ndims required when stencil_sizes is an int")
        stencil_sizes = [stencil_sizes] * ndims
    ndims = len(stencil_sizes)
    if isinstance(orders, int):
        orders = [orders] * ndims
    out = np.zeros([ndims] + list(stencil_sizes), dtype=np.float64)
    centers = [s // 2 for s in stencil_sizes]
    for dim in range(ndims):
        idx = [dim] + list(centers)
        idx[dim + 1] = slice(None)
        out[tuple(idx)] += fd_stencil_1d(stencil_sizes[dim], orders[dim])
    return out


def _conv1d_along_axis(u: jax.Array, kernel: jax.Array, axis: int) -> jax.Array:
    """VALID 1-D convolution (cross-correlation; symmetric kernels so identical)
    of an NHWC-style tensor along one spatial axis, identical for every channel.

    u: (B, *spatial, C); axis indexes into the spatial dims (0-based).
    kernel: (k,) fixed coefficients.
    """
    nd = u.ndim - 2  # number of spatial dims
    k = kernel.shape[0]
    # Move target axis last-but-one, flatten everything else into batch.
    spatial_axis = 1 + axis
    perm = [i for i in range(u.ndim) if i != spatial_axis] + [spatial_axis]
    up = jnp.transpose(u, perm)  # (..., n)
    lead_shape = up.shape[:-1]
    n = up.shape[-1]
    flat = up.reshape((-1, 1, n))  # (N, 1, n) as NCW for conv_general_dilated
    kern = kernel.astype(u.dtype).reshape((1, 1, k))  # (O=1, I=1, W=k)
    out = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
    )  # (N, 1, n-k+1)
    out = out.reshape(lead_shape + (n - k + 1,))
    inv_perm = np.argsort(perm)
    return jnp.transpose(out, inv_perm)


def _crop_axis(u: jax.Array, axis: int, lo: int, hi: int) -> jax.Array:
    spatial_axis = 1 + axis
    sl = [slice(None)] * u.ndim
    sl[spatial_axis] = slice(lo, u.shape[spatial_axis] - hi)
    return u[tuple(sl)]


def apply_fd_operator(
    u: jax.Array,
    dx: jax.Array,
    stencil_sizes,
    orders,
) -> jax.Array:
    """Apply the cross-shaped FD operator sum_k (1/dx_k^order_k) d^order/dx_k^order
    to `u`, returning interior values only (VALID on every axis, like the
    reference's single ndims-D conv in `physics_informed_loss.py:34-44`).

    u: (B, *spatial, C). dx: (B, ndims) per-sample grid spacings (or (B, 1),
    broadcast to all dims). Returns (B, *spatial - (stencil-1), C).
    """
    nd = u.ndim - 2
    if isinstance(stencil_sizes, int):
        stencil_sizes = [stencil_sizes] * nd
    if isinstance(orders, int):
        orders = [orders] * nd
    if dx.shape[-1] == 1 and nd > 1:
        dx = jnp.broadcast_to(dx, dx.shape[:-1] + (nd,))
    halves = [s // 2 for s in stencil_sizes]
    terms = []
    for dim in range(nd):
        kern = jnp.asarray(fd_stencil_1d(stencil_sizes[dim], orders[dim]), dtype=u.dtype)
        t = _conv1d_along_axis(u, kern, dim)
        # crop the other axes so every term covers the same interior region
        for other in range(nd):
            if other != dim:
                t = _crop_axis(t, other, halves[other], halves[other])
        scale = (1.0 / dx[:, dim] ** orders[dim]).astype(u.dtype)
        scale = scale.reshape((-1,) + (1,) * (u.ndim - 1))
        terms.append(t * scale)
    return sum(terms)


def laplacian_fd(u: jax.Array, dx: jax.Array, stencil_size: int = 3) -> jax.Array:
    """FD Laplacian of u on the interior (VALID region). u: (B, *spatial, C)."""
    nd = u.ndim - 2
    return apply_fd_operator(u, dx, stencil_size, 2)


def second_derivative_matrix_nonuniform(x) -> np.ndarray:
    """(n, n) matrix applying d^2/dx^2 on an arbitrary (e.g. Chebyshev) 1-D
    grid via per-point 3-point nonuniform stencils — the variable-spacing FD
    capability of the reference's `poisson_lhs_matrix.py:65-85` (its own oracle
    checks 2nd-derivative accuracy on Chebyshev grids, `:215-247`). Boundary
    rows are zero (Dirichlet use)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[0]
    mat = np.zeros((n, n))
    for i in range(1, n - 1):
        pos = x[i - 1 : i + 2] - x[i]
        mat[i, i - 1 : i + 2] = fd_coefficients_nonuniform(pos, 2)
    return mat


def fd_coefficients_nonuniform(offsets, order: int) -> np.ndarray:
    """FD coefficients for arbitrary real offsets (Vandermonde moment system);
    `fd_coefficients` restricted to integers is the uniform special case."""
    pos = np.asarray(offsets, dtype=np.float64)
    n = len(pos)
    if order >= n:
        raise ValueError(f"order {order} needs more than {n} points")
    vander = np.stack([pos**k for k in range(n)])
    rhs = np.zeros((n,), dtype=np.float64)
    rhs[order] = math.factorial(order)
    return np.linalg.solve(vander, rhs)


def poisson_lhs_matrix(grid_shape, dx) -> np.ndarray:
    """Dense 5-point Poisson system matrix over the interior unknowns of a
    (n0, n1) grid with homogeneous Dirichlet BCs (row-major interior ordering)
    — parity with the reference's matrix assembly
    (`dataset/utils/poisson_lhs_matrix.py:87-135`, validated there against
    pyamg's Poisson matrix). dx: (2,) spacings."""
    n0, n1 = grid_shape
    ni0, ni1 = n0 - 2, n1 - 2
    d0 = np.diag(-2.0 * np.ones(ni0)) + np.eye(ni0, k=1) + np.eye(ni0, k=-1)
    d1 = np.diag(-2.0 * np.ones(ni1)) + np.eye(ni1, k=1) + np.eye(ni1, k=-1)
    return (
        np.kron(d0, np.eye(ni1)) / float(dx[0]) ** 2
        + np.kron(np.eye(ni0), d1) / float(dx[1]) ** 2
    )
