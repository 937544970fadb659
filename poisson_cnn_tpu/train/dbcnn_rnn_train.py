"""Train the recurrent boundary network on numerical-mode data.

Usage: python -m poisson_cnn_tpu.train.dbcnn_rnn_train <config.json> [...]
(Covers the reference's `train/dbcnn_rnn_train.py`.)
"""

import jax
import jax.numpy as jnp

from ..models import DBCRNN
from .cli import run
from .tasks import dbcnn_step_factory  # same (bc, dx, x_res) -> soln wiring


def _build(cfg):
    return DBCRNN(cfg)


def _init(model, data_cfg, grid_shape, key):
    bc = jnp.ones((data_cfg.batch_size, grid_shape[1], 1))
    dx = jnp.full((data_cfg.batch_size, 1), 0.01)
    return model.init(key, bc, dx, grid_shape[0])


def main(argv=None):
    return run(_build, dbcnn_step_factory, _init, argv)


if __name__ == "__main__":
    main()
