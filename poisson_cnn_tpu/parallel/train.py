"""Data-parallel training over a jax.sharding.Mesh.

TPU-native replacement for the reference's `tf.distribute.MirroredStrategy`
with `ReductionToOneDevice` (`poisson_CNN/train/hpnn_legacy_train.py:37`): the
train step is jitted over a device mesh with the batch sharded on the 'data'
axis and parameters replicated; XLA inserts the gradient all-reduce over ICI.
Loss normalization uses the global batch size (the reference's
`global_batch_size` pattern) so the sharded mean is exact.

The data generator is *folded into the train step*: each step takes only a PRNG
key, synthesizes its batch on-device (sharded along 'data'), and updates — no
host dataloader, no host->device transfer in the hot loop.

Gradient accumulation (reference
`Homogeneous_Poisson_NN_Legacy.py:266-287`) is a lax.scan over microbatches.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    opt_state: Any
    batch_stats: Any = None


def create_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(devices, (axis_name,))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, axis_name: str = "data") -> NamedSharding:
    return NamedSharding(mesh, P(axis_name))


def make_generating_train_step(
    generate_fn: Callable[[jax.Array], dict],
    loss_fn: Callable[[Any, dict], jax.Array],
    tx: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
    accumulation_steps: int = 1,
    donate: bool = True,
):
    """Build a jitted DP train step: (state, key) -> (state, metrics).

    generate_fn: key -> batch dict (on-device synthesis; called inside jit).
    loss_fn: (params, batch) -> scalar loss.
    With a mesh, the generated batch is constrained to 'data' sharding so the
    whole step (including generation) partitions across devices.
    """

    def step(state: TrainState, key: jax.Array):
        def batch_loss(params, key):
            batch = generate_fn(key)
            if mesh is not None:
                batch = jax.tree_util.tree_map(
                    lambda x: jax.lax.with_sharding_constraint(
                        x,
                        NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
                    ),
                    batch,
                )
            return loss_fn(params, batch)

        if accumulation_steps == 1:
            loss, grads = jax.value_and_grad(batch_loss)(state.params, key)
        else:
            keys = jax.random.split(key, accumulation_steps)

            def micro(carry, k):
                loss_i, grads_i = jax.value_and_grad(batch_loss)(state.params, k)
                acc_loss, acc_grads = carry
                return (
                    acc_loss + loss_i,
                    jax.tree_util.tree_map(jnp.add, acc_grads, grads_i),
                ), None

            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, state.params)
            (loss, grads), _ = jax.lax.scan(
                micro, (jnp.zeros(()), zero_grads), keys
            )
            loss = loss / accumulation_steps
            grads = jax.tree_util.tree_map(
                lambda g: g / accumulation_steps, grads
            )

        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        grad_norm = optax.global_norm(grads)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, {"loss": loss, "grad_norm": grad_norm}

    if mesh is not None:
        repl = replicate_sharding(mesh)
        return jax.jit(
            step,
            in_shardings=(repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_eval_step(model_apply: Callable, mesh: Optional[Mesh] = None):
    """Jitted inference step. With a mesh, the leading (batch) axis of every
    array argument is sharded over 'data' so large evaluation batches split
    across chips (DP inference)."""

    if mesh is None:
        return jax.jit(model_apply)

    def fwd(params, *args):
        args = tuple(
            jax.lax.with_sharding_constraint(
                a, NamedSharding(mesh, P("data", *([None] * (a.ndim - 1))))
            )
            if hasattr(a, "ndim") and a.ndim > 0
            else a
            for a in args
        )
        return model_apply(params, *args)

    return jax.jit(fwd)
