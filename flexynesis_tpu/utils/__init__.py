"""Evaluation, survival analysis, clustering, plotting, baselines, devices."""

from .clustering import (
    compute_ami_ari,
    get_important_features,
    get_optimal_clusters,
    k_means_clustering,
    louvain_clustering,
    print_summary_stats,
    scale_and_standardize_by_labels,
    subset_assays_by_features,
)
from .device import (
    create_device_from_string,
    get_device_memory_info,
    get_optimal_device,
    to_device_safe,
)
from .metrics import (
    bootstrap_metric,
    concordance_index,
    evaluate_classifier,
    evaluate_regressor,
    evaluate_survival,
    evaluate_wrapper,
    generate_bootstrap_indices,
    get_predicted_labels,
)
from .survival import (
    CoxPH,
    CoxPHFitter,
    KaplanMeier,
    build_cox_model,
    cumulative_dynamic_auc,
    find_optimal_cutoff,
    logrank_test,
    multivariate_logrank_test,
    recursive_binary_split_minN,
    split_by_median,
)

__all__ = [name for name in dir() if not name.startswith("_")]
