"""End-to-end training of the combined PCNN (HPNN + DBCNN superposition) on
numerical-mode data with all four boundaries + random RHS.

Usage: python -m poisson_cnn_tpu.train.pcnn_end_to_end <config.json> [...]
(Covers the reference's `pcnn_end_to_end.py`.)
"""

import jax
import jax.numpy as jnp

from ..models import PCNN
from .cli import run
from .tasks import pcnn_step_factory


def _build(cfg):
    return PCNN(cfg)


def _init(model, data_cfg, grid_shape, key):
    B = data_cfg.batch_size
    H, W = grid_shape
    return model.init(
        key,
        jnp.ones((B, H, W, 1)),
        jnp.ones((B, W, 1)),
        jnp.ones((B, H, 1)),
        jnp.ones((B, W, 1)),
        jnp.ones((B, H, 1)),
        jnp.full((B, 1), 0.01),
    )


def main(argv=None):
    return run(_build, pcnn_step_factory, _init, argv)


if __name__ == "__main__":
    main()
