from .config import (
    TrainingConfig,
    build_dataset_config,
    build_model_config,
    build_training_config,
    load_experiment,
)
from .loop import Trainer, make_optimizer, restore_checkpoint, save_checkpoint
from .tasks import dbcnn_step_factory, hpnn_step_factory, pcnn_step_factory
