"""Training runtime: jitted trainer, HPO engine, fine-tuning."""

from .finetune import FineTuner
from .hpo import HyperparameterTuning
from .trainer import EarlyStopper, Trainer, kfold_indices, train_val_split

__all__ = [
    "Trainer",
    "EarlyStopper",
    "HyperparameterTuning",
    "FineTuner",
    "train_val_split",
    "kfold_indices",
]
