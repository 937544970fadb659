"""Train the UNet baseline on reverse-mode data.

Usage: python -m poisson_cnn_tpu.train.unet_train <config.json> [...]
(Covers the reference's `train/UNet.py`.)
"""

import jax
import jax.numpy as jnp

from ..models import UNet
from .cli import run
from .tasks import hpnn_step_factory  # same (rhs, dx) -> soln wiring


def _build(cfg):
    return UNet(cfg)


def _init(model, data_cfg, grid_shape, key):
    rhs = jnp.ones((data_cfg.batch_size,) + grid_shape + (1,))
    dx = jnp.full((data_cfg.batch_size, 1), 0.01)
    return model.init(key, rhs, dx)


def main(argv=None):
    return run(_build, hpnn_step_factory, _init, argv)


if __name__ == "__main__":
    main()
