"""Train the HPNN on reverse-mode (analytic) data.

Usage: python -m poisson_cnn_tpu.train.hpnn_train <config.json>
           [--checkpoint_dir D --continue_from_checkpoint P --learning_rate LR
            --epochs N --data_parallel]
(Covers the reference's `hpnn_legacy_train.py` / `hpnn_train.py` /
`hpnn_legacy_train_neumann.py` — Neumann mode is `"bc_type": "neumann"` in the
model section + `"bc": "neumann"` in the dataset section.)
"""

import jax
import jax.numpy as jnp

from ..models import (
    HPNN,
    HPNNConfig,
    FluidnetHPNN,
    FluidnetHPNNConfig,
    FourierAutoencoderHPNN,
    FourierAutoencoderConfig,
    MetaHPNN,
    MetaHPNNConfig,
)
from .cli import run
from .tasks import hpnn_step_factory

# model_type dispatch (the reference's `hpnn_train.py:24-30` selects
# cnn_metalearning / cnn / autoencoder): the config's class picks the model
_MODELS = {
    HPNNConfig: HPNN,
    MetaHPNNConfig: MetaHPNN,
    FourierAutoencoderConfig: FourierAutoencoderHPNN,
    FluidnetHPNNConfig: FluidnetHPNN,
}


def _build(cfg):
    return _MODELS[type(cfg)](cfg)


def _init(model, data_cfg, grid_shape, key):
    rhs = jnp.ones((data_cfg.batch_size,) + grid_shape + (1,))
    dx = jnp.full((data_cfg.batch_size, 1), 0.01)
    return model.init(key, rhs, dx)


def main(argv=None):
    return run(_build, hpnn_step_factory, _init, argv)


if __name__ == "__main__":
    main()
