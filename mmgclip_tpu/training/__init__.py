from .checkpoint import load_checkpoint, save_checkpoint
from .early_stopping import EarlyStopper
from .experiment import ClassifierExperiment, create_experiment
from .optim import (
    LinearWarmupCosineAnnealing,
    ReduceLROnPlateau,
    create_optimizer,
    create_scheduler,
    set_learning_rate,
)

__all__ = [
    "load_checkpoint",
    "save_checkpoint",
    "EarlyStopper",
    "ClassifierExperiment",
    "create_experiment",
    "LinearWarmupCosineAnnealing",
    "ReduceLROnPlateau",
    "create_optimizer",
    "create_scheduler",
    "set_learning_rate",
]
