"""Train the DBCNN on numerical-mode data (zero RHS, one nonzero boundary).

Usage: python -m poisson_cnn_tpu.train.dbcnn_train <config.json> [...]
(Covers the reference's `dbcnn_legacy_train.py`.)
"""

import jax
import jax.numpy as jnp

from ..models import DBCNN, DBCNNConfig, MetaDBCNN, MetaDBCNNConfig
from .cli import run
from .tasks import dbcnn_step_factory

_MODELS = {DBCNNConfig: DBCNN, MetaDBCNNConfig: MetaDBCNN}


def _build(cfg):
    return _MODELS[type(cfg)](cfg)


def _init(model, data_cfg, grid_shape, key):
    bc = jnp.ones((data_cfg.batch_size, grid_shape[1], 1))
    dx = jnp.full((data_cfg.batch_size, 1), 0.01)
    return model.init(key, bc, dx, grid_shape[0])


def main(argv=None):
    return run(_build, dbcnn_step_factory, _init, argv)


if __name__ == "__main__":
    main()
