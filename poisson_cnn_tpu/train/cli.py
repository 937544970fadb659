"""Shared CLI runner for the train entry points.

Same interface shape as the reference scripts
(`python -m poisson_CNN.train.<script> <config.json> [--checkpoint_dir ...
--continue_from_checkpoint --learning_rate]`, `train/hpnn_legacy_train.py:14-20`).
"""

from __future__ import annotations

import argparse
import dataclasses

import numpy as np
import jax

from ..data import sample_grid_shape
from ..parallel import create_mesh
from .config import load_experiment
from .loop import Trainer, restore_checkpoint


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("config", help="path to experiment JSON")
    p.add_argument("--checkpoint_dir", default=None)
    p.add_argument("--continue_from_checkpoint", default=None)
    p.add_argument("--learning_rate", type=float, default=None)
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--data_parallel", action="store_true",
                   help="shard batches over all visible devices")
    p.add_argument("--metrics_path", default=None,
                   help="JSONL file for per-epoch metrics")
    return p.parse_args(argv)


def run(model_builder, step_factory, init_example, argv=None):
    """model_builder: model_cfg -> flax module.
    step_factory: (model, data_cfg, loss_cfg, mesh, accumulation_steps) -> make_step.
    init_example: (model, data_cfg, grid_shape, key) -> params.
    """
    args = parse_args(argv)
    model_cfg, data_cfg, train_cfg = load_experiment(args.config)
    if args.learning_rate is not None:
        train_cfg = dataclasses.replace(train_cfg, learning_rate=args.learning_rate)
    if args.epochs is not None:
        train_cfg = dataclasses.replace(train_cfg, n_epochs=args.epochs)

    mesh = create_mesh() if args.data_parallel else None
    model = model_builder(model_cfg)

    rng = np.random.default_rng(train_cfg.seed)
    grids = data_cfg.grids

    # init at the LARGEST shape in the sampling range: HPNN's scale-gated
    # branch pyramid only creates params for branches with min(shape) >= 2*ds,
    # so a small random init shape would leave the large-scale branches
    # without params and crash the first large-grid step
    init_shape = tuple(hi for (_, hi) in grids.shape_range)
    params = init_example(model, data_cfg, init_shape, jax.random.PRNGKey(train_cfg.seed))
    if args.continue_from_checkpoint:
        params, _ = restore_checkpoint(args.continue_from_checkpoint, params)

    loss_cfg = dataclasses.replace(
        train_cfg.loss, global_batch_size=data_cfg.batch_size
    )
    make_step = step_factory(
        model, data_cfg, loss_cfg, mesh, train_cfg.accumulation_steps
    )
    trainer = Trainer(
        params,
        sample_shape=lambda: sample_grid_shape(rng, grids),
        make_step=make_step,
        train_cfg=train_cfg,
        checkpoint_dir=args.checkpoint_dir,
        mesh=mesh,
        metrics_path=args.metrics_path,
    )
    state = trainer.run()
    return trainer, state
