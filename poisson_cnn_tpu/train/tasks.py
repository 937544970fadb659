"""Per-model training-step factories binding model + data engine + loss.

Equivalent role to the reference's train-script bodies
(`poisson_CNN/train/hpnn_legacy_train.py:32-60`, `dbcnn_legacy_train.py:26-50`,
`pcnn_end_to_end.py:28-56`): pick the generator mode and wire the model's
inputs/outputs into the shared loss. Every factory returns a
`make_step(grid_shape, tx)` suitable for `train.loop.Trainer` — each distinct
grid shape compiles one fused step (on-device data synthesis + fwd + bwd +
update).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

from ..data import generate_batch
from ..data.numerical import generate_numerical_batch
from ..losses import LossConfig, loss_wrapper
from ..parallel import make_generating_train_step


def hpnn_step_factory(model, data_cfg, loss_cfg: LossConfig, mesh=None, accumulation_steps: int = 1):
    """HPNN on reverse-mode data: inputs [rhs, dx], target = solution."""

    def make_step(grid_shape, tx):
        def generate_fn(key):
            return generate_batch(key, data_cfg, grid_shape)

        def loss_fn(params, batch):
            pred = model.apply(params, batch["rhs"], batch["dx"])
            return loss_wrapper(loss_cfg, batch["soln"], pred, batch["rhs"], batch["dx"])

        return make_generating_train_step(
            generate_fn, loss_fn, tx, mesh=mesh, accumulation_steps=accumulation_steps
        )

    return make_step


def dbcnn_step_factory(model, data_cfg, loss_cfg: LossConfig, mesh=None, accumulation_steps: int = 1):
    """DBCNN on numerical-mode data: zero RHS, one nonzero ('left') boundary;
    inputs [bc, dx, x_output_resolution], target = Laplace solution."""

    def make_step(grid_shape, tx):
        def generate_fn(key):
            return generate_numerical_batch(key, data_cfg, grid_shape)

        def loss_fn(params, batch):
            bc = batch["boundaries"]["left"]
            pred = model.apply(params, bc, batch["dx"], grid_shape[0])
            return loss_wrapper(
                loss_cfg, batch["soln"], pred, jnp.zeros_like(batch["soln"]), batch["dx"]
            )

        return make_generating_train_step(
            generate_fn, loss_fn, tx, mesh=mesh, accumulation_steps=accumulation_steps
        )

    return make_step


def pcnn_step_factory(model, data_cfg, loss_cfg: LossConfig, mesh=None, accumulation_steps: int = 1):
    """End-to-end combined model on numerical-mode data with all 4 boundaries."""

    def make_step(grid_shape, tx):
        def generate_fn(key):
            return generate_numerical_batch(key, data_cfg, grid_shape)

        def loss_fn(params, batch):
            b = batch["boundaries"]
            pred = model.apply(
                params, batch["rhs"], b["left"], b["top"], b["right"], b["bottom"],
                batch["dx"],
            )
            return loss_wrapper(loss_cfg, batch["soln"], pred, batch["rhs"], batch["dx"])

        return make_generating_train_step(
            generate_fn, loss_fn, tx, mesh=mesh, accumulation_steps=accumulation_steps
        )

    return make_step
