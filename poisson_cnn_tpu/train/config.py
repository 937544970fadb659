"""JSON experiment configs -> typed dataclasses.

Replaces the reference's config system (`poisson_CNN/experiments/*.json` +
recursive `eval` of "tf.*" strings, `utils/convert_tf_object_names.py:13-21`)
with explicit dataclass construction — activations are plain registry names,
nothing is eval'd. Schema keeps the reference's model/dataset/training sections.
"""

from __future__ import annotations

import dataclasses
import json

from ..data import GridSamplingConfig, Normalizations, ReverseConfig
from ..data.numerical import NumericalConfig
from ..losses import LossConfig
from ..models import (
    DBCNNConfig,
    DBCRNNConfig,
    FourierAutoencoderConfig,
    HPNNConfig,
    MetaDBCNNConfig,
    MetaHPNNConfig,
    PCNNConfig,
    UNetConfig,
)


def _tuplify(value):
    """Recursively convert lists to tuples so frozen configs stay hashable
    (hashability is what lets them be static jit arguments)."""
    if isinstance(value, list):
        return tuple(_tuplify(v) for v in value)
    if isinstance(value, dict):
        return {k: _tuplify(v) for k, v in value.items()}
    return value


def _build(cls, payload: dict):
    fields = {f.name for f in dataclasses.fields(cls)}
    unknown = set(payload) - fields
    if unknown:
        raise ValueError(f"unknown {cls.__name__} fields: {sorted(unknown)}")
    return cls(**{k: _tuplify(v) for k, v in payload.items()})


@dataclasses.dataclass(frozen=True)
class TrainingConfig:
    n_epochs: int = 10
    steps_per_epoch: int = 100
    optimizer: str = "adam"
    learning_rate: float = 1e-4
    min_learning_rate: float = 1e-7
    reduce_lr_patience: int = 4
    reduce_lr_factor: float = 0.5
    accumulation_steps: int = 1
    precision: str = "float32"
    weight_decay: float = 0.0  # used by optimizer='adamw'
    grad_clip_norm: float = 0.0  # 0 disables global-norm clipping
    # optimizer='adam-sgd' (the drift-proof two-phase recipe): fraction of
    # total epochs after which Adam hands over to a momentum-SGD tail, and
    # the tail's starting lr as a multiple of learning_rate
    sgd_tail_at: float = 0.35
    sgd_tail_lr_mult: float = 10.0
    seed: int = 0
    loss: LossConfig = LossConfig()


def build_grid_config(payload: dict) -> GridSamplingConfig:
    return _build(GridSamplingConfig, payload)


def build_dataset_config(payload: dict):
    payload = dict(payload)
    kind = payload.pop("type", "reverse")
    grids = build_grid_config(payload.pop("grids"))
    if kind == "reverse":
        norms = _build(Normalizations, payload.pop("normalizations", {}))
        return _build(
            ReverseConfig, {**payload, "grids": grids, "normalizations": norms}
        )
    if kind == "numerical":
        return _build(NumericalConfig, {**payload, "grids": grids})
    raise ValueError(f"unknown dataset type {kind}")


def build_model_config(payload: dict):
    payload = dict(payload)
    kind = payload.pop("type")
    if kind == "hpnn":
        return _build(HPNNConfig, payload)
    if kind == "dbcnn":
        return _build(DBCNNConfig, payload)
    if kind == "unet":
        return _build(UNetConfig, payload)
    if kind == "dbcrnn":
        return _build(DBCRNNConfig, payload)
    if kind == "fourier_autoencoder":
        return _build(FourierAutoencoderConfig, payload)
    if kind == "meta_hpnn":
        return _build(MetaHPNNConfig, payload)
    if kind == "meta_dbcnn":
        return _build(MetaDBCNNConfig, payload)
    if kind == "fluidnet_hpnn":
        from ..models import FluidnetHPNNConfig

        return _build(FluidnetHPNNConfig, payload)
    if kind == "pcnn":
        hpnn = _build(HPNNConfig, payload.pop("hpnn", {}))
        dbcnn = _build(DBCNNConfig, payload.pop("dbcnn", {}))
        return _build(PCNNConfig, {**payload, "hpnn": hpnn, "dbcnn": dbcnn})
    raise ValueError(f"unknown model type {kind}")


def build_training_config(payload: dict) -> TrainingConfig:
    payload = dict(payload)
    loss = _build(LossConfig, payload.pop("loss", {}))
    return _build(TrainingConfig, {**payload, "loss": loss})


def load_experiment(path: str):
    with open(path) as f:
        raw = json.load(f)
    return (
        build_model_config(raw["model"]),
        build_dataset_config(raw["dataset"]),
        build_training_config(raw.get("training", {})),
    )
