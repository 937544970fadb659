from .sampling import (
    GridSamplingConfig,
    proportion_of_aspect_ratios_under_1,
    sample_grid_shape,
    sample_grid_spacings,
)
from .reverse import (
    Normalizations,
    ReverseConfig,
    ReverseDataset,
    generate_batch,
)
from .numerical import NumericalConfig, generate_numerical_batch
from .analytical import (
    AnalyticalConfig,
    analytical_solution_for_rhs,
    generate_analytical_batch,
)
from .reverse_nd import ReverseNDConfig, generate_batch_nd
