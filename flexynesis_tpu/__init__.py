"""flexynesis-tpu: TPU-native multi-omics deep learning framework.

A ground-up JAX/Flax/Pallas rebuild of the capability surface of
BIMSBbioinfo/flexynesis (see SURVEY.md): multi-omics ingestion and
harmonization, five neural architectures with Bayesian HPO, survival /
classification / regression heads, integrated-gradients marker discovery,
classical-ML baselines and a full train/inference CLI — redesigned for TPU
(device-resident data, jit-compiled training, vmapped parallel HPO trials,
mesh sharding).

Submodules import lazily so ``flexynesis_tpu --help`` stays fast
(reference flexynesis/__init__.py:19-70 uses the same trick).
"""

from __future__ import annotations

import importlib
from types import ModuleType

__version__ = "0.1.0"

_LAZY_SUBMODULES = {
    "data": "flexynesis_tpu.data",
    "models": "flexynesis_tpu.models",
    "train": "flexynesis_tpu.train",
    "ops": "flexynesis_tpu.ops",
    "parallel": "flexynesis_tpu.parallel",
    "interpret": "flexynesis_tpu.interpret",
    "utils": "flexynesis_tpu.utils",
    "inference": "flexynesis_tpu.inference",
    "config": "flexynesis_tpu.config",
}

# commonly used names re-exported lazily
_LAZY_ATTRS = {
    "DataImporter": ("flexynesis_tpu.data.importer", "DataImporter"),
    "H5DataImporter": ("flexynesis_tpu.data.h5", "H5DataImporter"),
    "DataImporterInference": (
        "flexynesis_tpu.data.inference_importer",
        "DataImporterInference",
    ),
    "MultiOmicDataset": ("flexynesis_tpu.data.dataset", "MultiOmicDataset"),
    "MultiOmicDatasetNW": ("flexynesis_tpu.data.dataset", "MultiOmicDatasetNW"),
    "TripletMultiOmicDataset": (
        "flexynesis_tpu.data.dataset",
        "TripletMultiOmicDataset",
    ),
    "DirectPred": ("flexynesis_tpu.models", "DirectPred"),
    "SupervisedVAE": ("flexynesis_tpu.models", "SupervisedVAE"),
    "MultiTripletNetwork": ("flexynesis_tpu.models", "MultiTripletNetwork"),
    "CrossModalPred": ("flexynesis_tpu.models", "CrossModalPred"),
    "GNN": ("flexynesis_tpu.models", "GNN"),
    "MODEL_REGISTRY": ("flexynesis_tpu.models", "MODEL_REGISTRY"),
    "HyperparameterTuning": ("flexynesis_tpu.train.hpo", "HyperparameterTuning"),
    "FineTuner": ("flexynesis_tpu.train.finetune", "FineTuner"),
    "Trainer": ("flexynesis_tpu.train.trainer", "Trainer"),
    "evaluate_wrapper": ("flexynesis_tpu.utils.metrics", "evaluate_wrapper"),
    "get_predicted_labels": (
        "flexynesis_tpu.utils.metrics",
        "get_predicted_labels",
    ),
}


def __getattr__(name: str):
    if name in _LAZY_SUBMODULES:
        mod = importlib.import_module(_LAZY_SUBMODULES[name])
        globals()[name] = mod
        return mod
    if name in _LAZY_ATTRS:
        module_name, attr = _LAZY_ATTRS[name]
        value = getattr(importlib.import_module(module_name), attr)
        globals()[name] = value
        return value
    raise AttributeError(f"module 'flexynesis_tpu' has no attribute '{name}'")


def __dir__():
    return sorted(set(globals()) | set(_LAZY_SUBMODULES) | set(_LAZY_ATTRS))
