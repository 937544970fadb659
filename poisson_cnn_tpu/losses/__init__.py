from .losses import (
    mse_per_sample,
    mae_per_sample,
    integral_loss_per_sample,
    physics_informed_loss,
    LossConfig,
    loss_wrapper,
)
from .conv_laplacian import (
    conv_laplacian_loss,
    laplacian_9pt,
    variable_density_loss,
)
