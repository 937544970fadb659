"""Safe name→object registries for configs.

The reference resolves TF callables embedded in JSON configs with recursive
`eval` (`poisson_CNN/utils/convert_tf_object_names.py:13-21`) — replaced here by
explicit registries (no eval of config strings, ever).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import flax.linen as nn


ACTIVATIONS: dict[str, Callable] = {
    "linear": lambda x: x,
    "identity": lambda x: x,
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,
    "tanh": jnp.tanh,
    "sigmoid": jax.nn.sigmoid,
    "gelu": jax.nn.gelu,
    "elu": jax.nn.elu,
    "softmax": jax.nn.softmax,
    "swish": jax.nn.swish,
}

INITIALIZERS: dict[str, Any] = {
    "zeros": nn.initializers.zeros_init(),
    "ones": nn.initializers.ones_init(),
    "lecun_normal": nn.initializers.lecun_normal(),
    "glorot_uniform": nn.initializers.glorot_uniform(),
    "he_normal": nn.initializers.he_normal(),
}


def resolve_activation(act) -> Callable:
    """Accept a callable or a registered name. Also tolerates reference-style
    names like 'tf.nn.leaky_relu' by taking the last path component."""
    if callable(act):
        return act
    if isinstance(act, str):
        name = act.rsplit(".", 1)[-1].lower()
        if name in ACTIVATIONS:
            return ACTIVATIONS[name]
    raise ValueError(f"unknown activation {act!r}")


def resolve_initializer(init):
    if callable(init):
        return init
    if isinstance(init, str):
        name = init.rsplit(".", 1)[-1].lower()
        if name in INITIALIZERS:
            return INITIALIZERS[name]
    raise ValueError(f"unknown initializer {init!r}")
