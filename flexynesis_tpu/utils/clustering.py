"""Unsupervised analysis helpers.

Capability parity with /root/reference/flexynesis/utils.py:
``k_means_clustering`` (:1521-1543), ``louvain_clustering`` (:1545-1580),
``get_optimal_clusters`` (:1583-1623), ``compute_ami_ari`` (:1626-1635),
``scale_and_standardize_by_labels`` (:1662-1697),
``get_important_features`` (:1169-1186), ``subset_assays_by_features``
(:1187-1207), ``print_summary_stats`` (:1209-1232).

Louvain communities come from networkx (python-louvain is not shipped here;
networkx.community.louvain_communities is the same algorithm).
"""

from __future__ import annotations

from typing import Optional

import networkx as nx
import numpy as np
import pandas as pd
from sklearn.cluster import KMeans
from sklearn.metrics import (
    adjusted_mutual_info_score,
    adjusted_rand_score,
    silhouette_score,
)
from sklearn.metrics.pairwise import euclidean_distances


def k_means_clustering(data, k: int):
    """KMeans labels + fitted model."""
    km = KMeans(n_clusters=k, n_init="auto", random_state=42)
    labels = km.fit_predict(np.asarray(data))
    return labels, km


def louvain_clustering(X, threshold: Optional[float] = None, k: Optional[int] = None):
    """Louvain communities on a distance graph (threshold- or kNN-connected)."""
    X = np.asarray(X)
    distances = euclidean_distances(X)
    G = nx.Graph()
    G.add_nodes_from(range(len(X)))
    n = distances.shape[0]
    if k is not None:
        nbrs = np.argsort(distances, axis=1)[:, : k + 1]
    for i in range(n):
        for j in range(i + 1, n):
            if threshold is not None and distances[i, j] < threshold:
                G.add_edge(i, j, weight=1.0 / max(distances[i, j], 1e-12))
            elif k is not None and (j in nbrs[i]):
                G.add_edge(i, j, weight=1.0 / max(distances[i, j], 1e-12))
    communities = nx.community.louvain_communities(G, weight="weight", seed=42)
    partition = {}
    for ci, nodes in enumerate(communities):
        for node in nodes:
            partition[node] = ci
    labels = np.full(len(X), np.nan)
    for node, c in partition.items():
        labels[node] = c
    return labels, G, partition


def get_optimal_clusters(data, min_k: int = 2, max_k: int = 10):
    """Silhouette-optimal k for KMeans; returns (labels, k, score table)."""
    data = np.asarray(data)
    scores, labels_by_k = [], {}
    for k in range(min_k, max_k + 1):
        km = KMeans(n_clusters=k, n_init="auto", random_state=42)
        labels = km.fit_predict(data)
        scores.append((k, silhouette_score(data, labels)))
        labels_by_k[k] = labels
    df = pd.DataFrame(scores, columns=["k", "silhouette_score"])
    optimal_k = int(df.loc[df["silhouette_score"].idxmax(), "k"])
    return labels_by_k[optimal_k], optimal_k, df


def compute_ami_ari(labels1, labels2):
    """Adjusted mutual information + adjusted Rand index (NaN-safe)."""

    def clean(x):
        x = pd.Series(x).astype(object)
        return x.where(~pd.isna(x), "missing").astype(str).values

    l1, l2 = clean(labels1), clean(labels2)
    return {
        "ami": adjusted_mutual_info_score(l1, l2),
        "ari": adjusted_rand_score(l1, l2),
    }


def scale_and_standardize_by_labels(data_matrix, labels):
    """Per-group standardization (batch-wise z-scoring, utils.py:1662-1697)."""
    X = np.asarray(data_matrix, dtype=float).copy()
    labels = np.asarray(labels)
    for lb in pd.unique(labels):
        mask = labels == lb
        mu = X[mask].mean(axis=0)
        sd = X[mask].std(axis=0)
        sd[sd == 0] = 1.0
        X[mask] = (X[mask] - mu) / sd
    return X


def get_important_features(model, var: str, top: int = 20) -> pd.DataFrame:
    """Top features by stored importance for one variable (utils.py:1169-1186)."""
    if var not in model.feature_importances:
        raise ValueError(
            f"No feature importances computed for variable '{var}'. "
            "Run compute_feature_importance first."
        )
    df = model.feature_importances[var]
    return (
        df.sort_values("importance", ascending=False)
        .groupby("target_class", group_keys=False)
        .head(top)
        .reset_index(drop=True)
    )


def subset_assays_by_features(dataset, features_dict) -> np.ndarray:
    """Concatenate selected features across assays (utils.py:1187-1207)."""
    blocks = []
    for layer, feats in features_dict.items():
        idx = [dataset.features[layer].index(f) for f in feats]
        blocks.append(dataset.dat[layer][:, idx])
    return np.concatenate(blocks, axis=1)


def print_summary_stats(dataset) -> None:
    """Per-variable summary of the annotations (utils.py:1209-1232)."""
    for var, vtype in dataset.variable_types.items():
        arr = np.asarray(dataset.ann[var], dtype=float)
        if vtype == "categorical":
            mapping = dataset.label_mappings.get(var, {})
            vals, counts = np.unique(arr[~np.isnan(arr)], return_counts=True)
            named = {
                mapping.get(int(v), int(v)): int(c) for v, c in zip(vals, counts)
            }
            print(f"[INFO] {var} (categorical): {named}")
        else:
            print(
                f"[INFO] {var} (numerical): median={np.nanmedian(arr):.4g} "
                f"mean={np.nanmean(arr):.4g} "
                f"min={np.nanmin(arr):.4g} max={np.nanmax(arr):.4g}"
            )
