"""Pallas TPU kernels for the hot stencil ops.

`jacobi_smooth_pallas`: n weighted-Jacobi sweeps of lap(u)=rhs with the border
frozen — the post-smoother the HPNN/DBCNN/PCNN models and the multigrid solver
run repeatedly (reference concept: `poisson_CNN/layers/JacobiIterationLayer.py`).
The XLA version (`solvers.iterative.jacobi_smooth`) materialises every sweep to
HBM; this kernel keeps u and rhs resident in VMEM for all `n_iterations`
sweeps, so HBM traffic drops from ~2*n_iter*|u| to ~2*|u| — the op is bandwidth
bound, so that is the speedup lever. Grid is over the batch; per-sample 1/dx^2
scalars ride along as a small VMEM vector.

Falls back to the fused-XLA implementation on non-TPU backends (CPU tests run
the kernel in interpreter mode for correctness coverage).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _jacobi_kernel(n_iterations: int, omega: float, u_ref, rhs_ref, w_ref, out_ref):
    """One batch element per program. u_ref/rhs_ref/out_ref: (1, H, W) VMEM
    blocks; w_ref: (1, 1, 2) VMEM holding (1/dx0^2, 1/dx1^2).

    The sweep carries only the interior; the frozen boundary strips are hoisted
    out of the loop and stitched onto the neighbor shifts by concatenation
    (dynamic-update-slice on the carry would lower to an unsupported scatter).
    """
    w0 = w_ref[0, 0, 0]
    w1 = w_ref[0, 0, 1]
    diag = -2.0 * (w0 + w1)
    rhs_int = rhs_ref[0, 1:-1, 1:-1]
    top = u_ref[0, 0:1, 1:-1]      # frozen boundary strips (loop invariant)
    bottom = u_ref[0, -1:, 1:-1]
    left = u_ref[0, 1:-1, 0:1]
    right = u_ref[0, 1:-1, -1:]

    def body(_, interior):
        up = jnp.concatenate([top, interior[:-1, :]], axis=0)
        down = jnp.concatenate([interior[1:, :], bottom], axis=0)
        lft = jnp.concatenate([left, interior[:, :-1]], axis=1)
        rgt = jnp.concatenate([interior[:, 1:], right], axis=1)
        off = (up + down) * w0 + (lft + rgt) * w1
        u_new = (rhs_int - off) / diag
        return (1.0 - omega) * interior + omega * u_new

    interior = jax.lax.fori_loop(0, n_iterations, body, u_ref[0, 1:-1, 1:-1])
    out_ref[0, :, :] = u_ref[0, :, :]
    out_ref[0, 1:-1, 1:-1] = interior


@functools.partial(jax.jit, static_argnames=("n_iterations", "omega", "interpret"))
def jacobi_smooth_pallas(
    u: jax.Array,
    rhs: jax.Array,
    dx: jax.Array,
    n_iterations: int = 5,
    omega: float = 2.0 / 3.0,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for `solvers.jacobi_smooth` on TPU. u, rhs: (B, H, W, 1);
    dx: (B, 1|2)."""
    B, H, W, C = u.shape
    assert C == 1, "pallas smoother expects single-channel fields"
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))
    weights = (1.0 / dx.astype(u.dtype) ** 2).reshape(B, 1, 2)

    kernel = functools.partial(_jacobi_kernel, n_iterations, omega)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 2), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, H, W), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), u.dtype),
        interpret=interpret,
    )(u[..., 0], rhs[..., 0], weights)
    return out[..., None]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _jacobi_pallas_ad(u, rhs, dx, n_iterations, omega):
    return jacobi_smooth_pallas(u, rhs, dx, n_iterations, omega)


def _jacobi_fwd(u, rhs, dx, n_iterations, omega):
    return jacobi_smooth_pallas(u, rhs, dx, n_iterations, omega), (u, rhs, dx)


def _jacobi_bwd(n_iterations, omega, residuals, g):
    # backward through the (affine-in-u,rhs) smoother via the XLA reference
    # implementation's transpose — pallas fast path stays forward-only
    from ..solvers import jacobi_smooth

    u, rhs, dx = residuals
    _, vjp = jax.vjp(
        lambda u_, r_: jacobi_smooth(u_, r_, dx, n_iterations, omega=omega), u, rhs
    )
    gu, gr = vjp(g)
    return gu, gr, jnp.zeros_like(dx)


_jacobi_pallas_ad.defvjp(_jacobi_fwd, _jacobi_bwd)


def jacobi_smooth_auto(u, rhs, dx, n_iterations=5, omega=2.0 / 3.0):
    """Differentiable smoother: Pallas forward (custom VJP) on TPU, fused-XLA
    fallback elsewhere."""
    from ..solvers import jacobi_smooth

    if jax.default_backend() == "tpu" and u.shape[-1] == 1 and u.ndim == 4:
        return _jacobi_pallas_ad(u, rhs, dx, n_iterations, omega)
    return jacobi_smooth(u, rhs, dx, n_iterations, omega=omega)
