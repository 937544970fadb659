"""poisson_cnn_tpu — a TPU-native JAX/Flax/Pallas framework for CNN-based Poisson solvers.

Rebuilds the capabilities of aligirayhanozbay/poisson_CNN (see /root/repo/SURVEY.md)
from scratch with a TPU-first design:

- NHWC layouts, static shapes under jit, variable grids via bucketing + masks.
- On-device data synthesis (random Fourier/polynomial solutions with analytic RHS).
- Spectral (DST/DCT matmul), Cholesky, CG and geometric-multigrid reference solvers
  that run on-device (replacing the reference's pyamg/AMGX/tf.linalg native deps).
- Flax linen models: HPNN, DBCNN, combined PCNN, UNet, DBC-RNN, autoencoder,
  metalearning (hypernetwork) variants.
- Data-parallel bf16 training over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"

from . import ops
from . import solvers
from . import layers
from . import losses
from . import data
from . import models
from . import parallel
from . import utils
from . import ns2d
from . import train
from . import native
from . import api
