"""Random product-form polynomials with exact second derivatives — on-device.

Capability parity with the reference's Taylor/polynomial solution component
(`poisson_CNN/dataset/generators/reverse.py:38-99,230-256`): per spatial dim, a
random polynomial X(x_hat) on x_hat in [0,1] (optionally vanishing at 0 and 1 for
homogeneous Dirichlet BCs), its second derivative w.r.t. the *physical* coordinate
(divide by L^2), solutions as products X(x)Y(y)... and RHS as X''YZ + XY''Z + ...

TPU-first design: the reference evaluates root-product polynomials pointwise and
differentiates with tf.gradients, then patches the NaNs autodiff produces. Here we
expand the root products into monomial coefficients (tiny static scans), derive
exact derivative coefficients, and evaluate with power-basis matmuls — exact, NaN-
free, and batched.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def roots_to_coefficients(roots: jax.Array) -> jax.Array:
    """Expand prod_i (x + r_i) into monomial coefficients (ascending powers).

    roots: (..., d). Returns (..., d+1) with out[..., k] the coefficient of x^k.
    """
    d = roots.shape[-1]
    batch_shape = roots.shape[:-1]
    coeffs = jnp.zeros(batch_shape + (d + 1,), dtype=roots.dtype)
    coeffs = coeffs.at[..., 0].set(1.0)
    for i in range(d):  # static, d is small (< ~12)
        r = roots[..., i : i + 1]
        shifted = jnp.concatenate(
            [jnp.zeros(batch_shape + (1,), dtype=roots.dtype), coeffs[..., :-1]], axis=-1
        )
        coeffs = shifted + r * coeffs
    return coeffs


def polynomial_derivative_coefficients(coeffs: jax.Array, order: int = 1) -> jax.Array:
    """Coefficients of the derivative (same length, zero-padded at the top)."""
    n = coeffs.shape[-1]
    out = coeffs
    for _ in range(order):
        powers = jnp.arange(1, n, dtype=coeffs.dtype)
        dropped = out[..., 1:] * powers
        out = jnp.concatenate(
            [dropped, jnp.zeros(out.shape[:-1] + (1,), dtype=coeffs.dtype)], axis=-1
        )
    return out


def polyval_on_unit_grid(coeffs: jax.Array, npts: int) -> jax.Array:
    """Evaluate polynomials on linspace(0,1,npts) via a power-basis matmul.

    coeffs: (..., n) ascending powers. Returns (..., npts).
    """
    n = coeffs.shape[-1]
    x = jnp.linspace(0.0, 1.0, npts, dtype=coeffs.dtype)
    powers = jnp.arange(n, dtype=coeffs.dtype)
    vander = x[None, :] ** powers[:, None]  # (n, npts)
    return jnp.tensordot(coeffs, vander, axes=[[-1], [0]])


def random_polynomials_and_second_derivatives(
    key: jax.Array,
    batch_size: int,
    max_degree: int,
    npts: int,
    domain_sizes: jax.Array,
    homogeneous_bc: bool = False,
    degree: jax.Array | None = None,
    dtype=jnp.float32,
):
    """Batch of random-degree 1-D polynomials X(x_hat) sampled on npts points, plus
    exact d^2 X / dx_phys^2 = X''(x_hat) / L^2.

    Mirrors the reference's construction: for i = 2..max_degree, build a degree-i
    root-product polynomial (roots uniform in [-1, 0]; for homogeneous BCs the
    roots include 0 and -1 so X(0)=X(1)=0), then mix the family with uniform[-1,1]
    coefficients (`reverse.py:230-256`). `degree` (B,) optionally restricts each
    sample's mixture to degrees <= degree[b] (per-sample random smoothness).

    Returns (p, ddp): each (B, npts).
    """
    n_family = max_degree - 1  # degrees 2..max_degree
    if n_family < 1:
        raise ValueError("max_degree must be >= 2")
    k_roots, k_mix = jax.random.split(key)
    all_roots = -jax.random.uniform(
        k_roots, (batch_size, n_family, max_degree), dtype=dtype
    )
    mix = jax.random.uniform(
        k_mix, (batch_size, n_family), dtype=dtype, minval=-1.0, maxval=1.0
    )
    if degree is not None:
        fam_degrees = jnp.arange(2, max_degree + 1)  # (n_family,)
        mix = mix * (fam_degrees[None, :] <= degree[:, None]).astype(dtype)

    coeff_list = []
    for i, deg in enumerate(range(2, max_degree + 1)):
        roots = all_roots[:, i, :deg]  # (B, deg) -> polynomial of degree deg
        if homogeneous_bc:
            # overwrite first two roots with 0 and -1: factors x * (x - 1)
            roots = jnp.concatenate(
                [
                    jnp.zeros((batch_size, 1), dtype=dtype),
                    -jnp.ones((batch_size, 1), dtype=dtype),
                    roots[:, 2:],
                ],
                axis=-1,
            )
        c = roots_to_coefficients(roots)  # (B, deg+1)
        pad = max_degree + 1 - c.shape[-1]
        if pad:
            c = jnp.pad(c, ((0, 0), (0, pad)))
        coeff_list.append(c)
    family = jnp.stack(coeff_list, axis=1)  # (B, n_family, max_degree+1)
    coeffs = jnp.einsum("bf,bfc->bc", mix, family)  # (B, max_degree+1)

    p = polyval_on_unit_grid(coeffs, npts)
    dd_coeffs = polynomial_derivative_coefficients(coeffs, order=2)
    ddp_hat = polyval_on_unit_grid(dd_coeffs, npts)
    ddp = ddp_hat / (domain_sizes.astype(dtype) ** 2)[:, None]
    return p, ddp
