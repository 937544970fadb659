from .registry import (
    ACTIVATIONS,
    INITIALIZERS,
    resolve_activation,
    resolve_initializer,
)
