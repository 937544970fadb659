"""Spatial domain decomposition over the device mesh: stencil iteration with
halo exchange.

This is the scale-up analog the reference lacks entirely (SURVEY.md §2.10: the
reference is single-host data-parallel only) — for grids too large for one
chip's HBM (512^2+ and 3-D), the field is sharded along the first spatial axis
across the mesh, and each Jacobi sweep exchanges one-row halos with the two
neighbours via `lax.ppermute` (nearest-neighbour ICI traffic, no all-gathers).
Global domain boundaries stay frozen exactly as in the single-device smoother,
so results are bit-comparable to `solvers.jacobi_smooth`.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def jacobi_smooth_spatial(
    mesh: Mesh,
    u: jax.Array,
    rhs: jax.Array,
    dx: jax.Array,
    n_iterations: int = 5,
    omega: float = 0.8,  # matches solvers.jacobi_smooth's default
    axis_name: str = "data",
) -> jax.Array:
    """Weighted-Jacobi smoothing of lap(u)=rhs with u, rhs sharded along H.

    u, rhs: (B, H, W, C) with H divisible by the mesh axis size; dx: (B, 2)
    or (B, 1). Returns the smoothed field with the same sharding.
    """
    n_dev = mesh.shape[axis_name]
    B, H, W, C = u.shape
    if H % n_dev:
        raise ValueError(f"H={H} not divisible by mesh axis size {n_dev}")
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))

    def local_fn(u_loc, rhs_loc, dx_rep):
        # u_loc: (B, H/n_dev, W, C)
        idx = jax.lax.axis_index(axis_name)
        inv_dx2 = (1.0 / dx_rep**2).astype(u_loc.dtype)
        w0 = inv_dx2[:, 0][:, None, None, None]
        w1 = inv_dx2[:, 1][:, None, None, None]
        diag = -2.0 * (w0 + w1)
        h_loc = u_loc.shape[1]
        # frozen-row mask: global first row (device 0) and last row (device
        # n_dev-1); frozen columns 0 and W-1 everywhere
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, h_loc, 1, 1), 1)
        frozen_rows = jnp.logical_or(
            jnp.logical_and(idx == 0, row_ids == 0),
            jnp.logical_and(idx == n_dev - 1, row_ids == h_loc - 1),
        )
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2)
        frozen_cols = jnp.logical_or(col_ids == 0, col_ids == W - 1)
        frozen = jnp.logical_or(frozen_rows, frozen_cols)

        up_perm = [(i, i + 1) for i in range(n_dev - 1)]  # send down
        down_perm = [(i + 1, i) for i in range(n_dev - 1)]  # send up

        def sweep(_, u_loc):
            # halo rows from neighbours (zeros at the global ends — those rows
            # are frozen so the zero halos never enter a kept update)
            top_halo = jax.lax.ppermute(
                u_loc[:, -1:, :, :], axis_name, up_perm
            )
            bot_halo = jax.lax.ppermute(
                u_loc[:, :1, :, :], axis_name, down_perm
            )
            ext = jnp.concatenate([top_halo, u_loc, bot_halo], axis=1)
            up = ext[:, :-2, :, :]
            down = ext[:, 2:, :, :]
            left = jnp.pad(u_loc[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
            right = jnp.pad(u_loc[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
            off = (up + down) * w0 + (left + right) * w1
            u_new = (rhs_loc - off) / diag
            cand = (1.0 - omega) * u_loc + omega * u_new
            return jnp.where(frozen, u_loc, cand)

        return jax.lax.fori_loop(0, n_iterations, sweep, u_loc)

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(spec, spec, P()),
        out_specs=spec,
    )
    u = jax.device_put(u, NamedSharding(mesh, spec))
    rhs = jax.device_put(rhs, NamedSharding(mesh, spec))
    return fn(u, rhs, dx)


def conjugate_gradient_spatial(
    mesh: Mesh,
    rhs: jax.Array,
    dx: jax.Array,
    n_iterations: int = 200,
    x0: jax.Array | None = None,
    axis_name: str = "data",
) -> jax.Array:
    """Spatially-decomposed full Poisson solve: fixed-iteration CG for
    lap(u)=rhs with homogeneous Dirichlet BCs, fields sharded along H.

    The multi-chip twin of `solvers.conjugate_gradient` — same math on the
    same unknowns, expressed shard-locally: each matvec exchanges one-row
    halos with the two H-neighbours via `lax.ppermute` (nearest-neighbour ICI
    traffic only) and the CG inner products become `lax.psum` reductions.
    This is the piece the reference cannot do at all (single-host DP only,
    `poisson_CNN/train/hpnn_legacy_train.py:37`): a full solve over a grid
    whose working set exceeds one chip's HBM.

    rhs: (B, H, W, C) with H divisible by the mesh axis size; dx (B, 1|2).
    Matches the single-device solver to fp32 reduction-order tolerance.
    """
    n_dev = mesh.shape[axis_name]
    B, H, W, C = rhs.shape
    if H % n_dev:
        raise ValueError(f"H={H} not divisible by mesh axis size {n_dev}")
    if dx.shape[-1] == 1:
        dx = jnp.broadcast_to(dx, (B, 2))
    if x0 is None:
        x0 = jnp.zeros_like(rhs)

    up_perm = [(i, i + 1) for i in range(n_dev - 1)]  # send down
    down_perm = [(i + 1, i) for i in range(n_dev - 1)]  # send up

    def local_fn(rhs_loc, x0_loc, dx_rep):
        idx = jax.lax.axis_index(axis_name)
        inv_dx2 = (1.0 / dx_rep**2).astype(rhs_loc.dtype)
        w0 = inv_dx2[:, 0][:, None, None, None]
        w1 = inv_dx2[:, 1][:, None, None, None]
        h_loc = rhs_loc.shape[1]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (1, h_loc, 1, 1), 1)
        global_row = idx * h_loc + row_ids
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W, 1), 2)
        interior = (
            (global_row > 0) & (global_row < H - 1)
            & (col_ids > 0) & (col_ids < W - 1)
        )

        def matvec(u):
            # halo rows (zeros at the global ends: those rows are masked out)
            top = jax.lax.ppermute(u[:, -1:, :, :], axis_name, up_perm)
            bot = jax.lax.ppermute(u[:, :1, :, :], axis_name, down_perm)
            ext = jnp.concatenate([top, u, bot], axis=1)
            vert = ext[:, :-2, :, :] - 2.0 * u + ext[:, 2:, :, :]
            left = jnp.pad(u[:, :, :-1, :], ((0, 0), (0, 0), (1, 0), (0, 0)))
            right = jnp.pad(u[:, :, 1:, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
            horz = left - 2.0 * u + right
            return jnp.where(interior, vert * w0 + horz * w1, 0.0)

        def pdot(a, b):
            return jax.lax.psum(
                jnp.sum(a * b, axis=(1, 2, 3)), axis_name
            )

        b = jnp.where(interior, rhs_loc, 0.0)
        x = jnp.where(interior, x0_loc, 0.0)
        r = b - matvec(x)
        p = r
        rs = pdot(r, r)
        rs0 = rs

        def body(_, carry):
            # freeze converged samples (fp32 round-off amplification guard,
            # same policy as the single-device solver)
            x, r, p, rs = carry
            live = rs > 1e-12 * rs0 + 1e-30
            ap = matvec(p)
            denom = pdot(p, ap)
            alpha = jnp.where(live, rs / jnp.where(denom == 0, 1.0, denom), 0.0)
            x = x + alpha[:, None, None, None] * p
            r = r - alpha[:, None, None, None] * ap
            rs_new = jnp.where(live, pdot(r, r), rs)
            beta = jnp.where(live, rs_new / jnp.where(rs == 0, 1.0, rs), 0.0)
            p = r + beta[:, None, None, None] * p
            return x, r, p, rs_new

        x, _, _, _ = jax.lax.fori_loop(0, n_iterations, body, (x, r, p, rs))
        x = jnp.where(
            jnp.isfinite(rs0)[:, None, None, None], x, jnp.full_like(x, jnp.nan)
        )
        return x

    spec = P(None, axis_name, None, None)
    fn = shard_map(
        local_fn, mesh=mesh, in_specs=(spec, spec, P()), out_specs=spec
    )
    rhs = jax.device_put(rhs, NamedSharding(mesh, spec))
    x0 = jax.device_put(x0, NamedSharding(mesh, spec))
    return fn(rhs, x0, dx)


def make_spatial_train_step(
    mesh: Mesh, apply_fn, loss_fn, tx, axis_name: str = "data",
):
    """Full training step with activations AND gradients spatially sharded
    along H (GSPMD) — the scale-out completion of `spatial_sharded_forward`.

    The batch fields (rhs, soln) are sharded along the H axis over the mesh;
    params and optimizer state are replicated. XLA's SPMD partitioner then
    shards every conv in BOTH the forward and backward graphs (halo
    collective-permutes over ICI), and the gradient contractions for the
    replicated params become psum-style cross-shard reductions — so per-device
    activation memory scales ~1/n_dev for the whole step, which is what lets
    training run on grids (1025^2+, 3-D) whose single-chip working set exceeds
    HBM. This is the capability the reference cannot express at all
    (single-host mirrored DP only, `poisson_CNN/train/hpnn_legacy_train.py:37`).

    apply_fn(params, rhs, dx) -> pred; loss_fn(soln, pred, rhs, dx) -> scalar.
    Returns step(params, opt_state, rhs, soln, dx) -> (params, opt_state, loss),
    jitted with sharding annotations (feed inputs through
    `jax.device_put(x, NamedSharding(mesh, P(None, axis_name, None, None)))`
    or let jit re-shard them).
    """
    import optax

    spec = NamedSharding(mesh, P(None, axis_name, None, None))
    repl = NamedSharding(mesh, P())

    def step(params, opt_state, rhs, soln, dx):
        def lf(p):
            pred = apply_fn(p, rhs, dx)
            return loss_fn(soln, pred, rhs, dx)

        loss, grads = jax.value_and_grad(lf)(params)
        updates, opt_state2 = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state2, loss

    return jax.jit(
        step,
        in_shardings=(repl, repl, spec, spec, repl),
        out_shardings=(repl, repl, repl),
    )


def spatial_sharded_forward(
    mesh: Mesh, apply_fn, params, rhs: jax.Array, dx: jax.Array,
    axis_name: str = "data", donate: bool = False,
):
    """Model forward with activations spatially sharded along H (GSPMD).

    The idiomatic TPU scale-up path for grids beyond one chip's HBM: annotate
    the input/output shardings over the mesh and let XLA's SPMD partitioner
    split every conv spatially, inserting the halo collective-permutes and
    turning the resize matmuls / global reductions (GroupNorm, max-magnitude
    scaling) into ICI collectives. Params are replicated (they are tiny next
    to large-grid activations).

    Returns (out, compiled) where `compiled` exposes `.memory_analysis()` —
    per-device activation memory should scale ~1/n_dev vs a single-device
    compile of the same shape, which is the point.
    """
    spec = NamedSharding(mesh, P(None, axis_name, None, None))
    repl = NamedSharding(mesh, P())
    jf = jax.jit(apply_fn, in_shardings=(repl, spec, repl), out_shardings=spec)
    compiled = jf.lower(params, rhs, dx).compile()
    rhs = jax.device_put(rhs, spec)
    dx = jax.device_put(dx, repl)
    params = jax.device_put(params, repl)
    return compiled(params, rhs, dx), compiled
