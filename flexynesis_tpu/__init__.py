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
    # notebook-facing analysis helpers (reference flexynesis.* surface)
    "evaluate_baseline_performance": (
        "flexynesis_tpu.utils.baselines", "evaluate_baseline_performance",
    ),
    "evaluate_baseline_survival_performance": (
        "flexynesis_tpu.utils.baselines",
        "evaluate_baseline_survival_performance",
    ),
    "plot_dim_reduced": ("flexynesis_tpu.utils.plotting", "plot_dim_reduced"),
    "plot_kaplan_meier_curves": (
        "flexynesis_tpu.utils.plotting", "plot_kaplan_meier_curves",
    ),
    "plot_scatter": ("flexynesis_tpu.utils.plotting", "plot_scatter"),
    "plot_boxplot": ("flexynesis_tpu.utils.plotting", "plot_boxplot"),
    "plot_roc_curves": ("flexynesis_tpu.utils.plotting", "plot_roc_curves"),
    "plot_pr_curves": ("flexynesis_tpu.utils.plotting", "plot_pr_curves"),
    "plot_hazard_ratios": (
        "flexynesis_tpu.utils.plotting", "plot_hazard_ratios",
    ),
    "plot_label_concordance_heatmap": (
        "flexynesis_tpu.utils.plotting", "plot_label_concordance_heatmap",
    ),
    "build_cox_model": ("flexynesis_tpu.utils.survival", "build_cox_model"),
    "CoxPHFitter": ("flexynesis_tpu.utils.survival", "CoxPHFitter"),
    "split_by_median": ("flexynesis_tpu.utils.survival", "split_by_median"),
    "find_optimal_cutoff": (
        "flexynesis_tpu.utils.survival", "find_optimal_cutoff",
    ),
    "recursive_binary_split_minN": (
        "flexynesis_tpu.utils.survival", "recursive_binary_split_minN",
    ),
    "k_means_clustering": (
        "flexynesis_tpu.utils.clustering", "k_means_clustering",
    ),
    "louvain_clustering": (
        "flexynesis_tpu.utils.clustering", "louvain_clustering",
    ),
    "get_optimal_clusters": (
        "flexynesis_tpu.utils.clustering", "get_optimal_clusters",
    ),
    "compute_ami_ari": ("flexynesis_tpu.utils.clustering", "compute_ami_ari"),
    "get_important_features": (
        "flexynesis_tpu.utils.clustering", "get_important_features",
    ),
    "print_summary_stats": (
        "flexynesis_tpu.utils.clustering", "print_summary_stats",
    ),
    "remove_batch_associated_variables": (
        "flexynesis_tpu.utils.batch_correction",
        "remove_batch_associated_variables",
    ),
    "optimal_transport_align": (
        "flexynesis_tpu.utils.batch_correction", "optimal_transport_align",
    ),
    "reciprocal_pca_mnn": (
        "flexynesis_tpu.utils.batch_correction", "reciprocal_pca_mnn",
    ),
    "CBioPortalData": ("flexynesis_tpu.utils.cbioportal", "CBioPortalData"),
    "STRING": ("flexynesis_tpu.data.graph", "STRING"),
    "read_user_graph": ("flexynesis_tpu.data.graph", "read_user_graph"),
    "get_optimal_device": (
        "flexynesis_tpu.utils.device", "get_optimal_device",
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
