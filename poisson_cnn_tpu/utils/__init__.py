from .registry import (
    ACTIVATIONS,
    INITIALIZERS,
    resolve_activation,
    resolve_initializer,
)
from .profiling import MetricsLogger, StepTimer, benchmark, trace
