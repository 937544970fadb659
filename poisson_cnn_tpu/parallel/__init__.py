from .train import (
    TrainState,
    create_mesh,
    replicate_sharding,
    batch_sharding,
    make_generating_train_step,
    make_eval_step,
)
from .spatial import (
    jacobi_smooth_spatial,
    conjugate_gradient_spatial,
    spatial_sharded_forward,
    make_spatial_train_step,
)
