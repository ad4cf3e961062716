"""Batch-effect correction toolkit (experimental, library-only — matching the
reference's status, SURVEY.md §2 #35).

Capability parity with /root/reference/flexynesis/utils.py:
* ``remove_batch_associated_variables`` (:1102-1166) — RF feature selection
  for targets minus mutual-information-flagged batch features.
* ``generate_synthetic_batches``        (:1767-1788)
* ``optimal_transport_align``           (:1790-1857) — POT's exact ``ot.emd``
  is replaced by a native JAX Sinkhorn solver (low-entropy regularization
  approximates the EMD plan; the whole solve is one jit-compiled loop of
  matmuls — TPU-friendly, unlike the network-simplex EMD).
* ``reciprocal_pca_mnn``                (:1860-1964)
* ``compute_correlation_loss``          (:2121-2141) — jnp instead of torch
* ``compute_transport_cost``            (:2144-2179) — geomloss SamplesLoss
  ("sinkhorn") replaced by the same native Sinkhorn divergence.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
from sklearn.decomposition import PCA
from sklearn.ensemble import RandomForestClassifier, RandomForestRegressor
from sklearn.feature_selection import (
    SelectFromModel,
    mutual_info_classif,
    mutual_info_regression,
)
from sklearn.neighbors import NearestNeighbors
from sklearn.preprocessing import StandardScaler


# ------------------------------------------------------- JAX Sinkhorn core


@partial(jax.jit, static_argnames=("n_iters",))
def sinkhorn_plan(cost: jnp.ndarray, eps: float = 0.01, n_iters: int = 500):
    """Entropy-regularized OT plan between uniform marginals (log-domain)."""
    n, m = cost.shape
    log_a = -jnp.log(n) * jnp.ones(n)
    log_b = -jnp.log(m) * jnp.ones(m)
    K = -cost / eps

    def body(_, uv):
        u, v = uv
        u = log_a - jax.scipy.special.logsumexp(K + v[None, :], axis=1)
        v = log_b - jax.scipy.special.logsumexp(K + u[:, None], axis=0)
        return u, v

    u, v = jax.lax.fori_loop(0, n_iters, body, (jnp.zeros(n), jnp.zeros(m)))
    return jnp.exp(K + u[:, None] + v[None, :])


def sinkhorn_divergence(x: jnp.ndarray, y: jnp.ndarray, blur: float = 0.5,
                        n_iters: int = 300) -> jnp.ndarray:
    """Debiased Sinkhorn divergence S(x,y) = OT(x,y) - (OT(x,x)+OT(y,y))/2."""

    def sq_cost(a, b):
        a2 = jnp.sum(a * a, 1)[:, None]
        b2 = jnp.sum(b * b, 1)[None, :]
        return jnp.maximum(a2 + b2 - 2 * a @ b.T, 0.0)

    eps = blur**2

    def ot_cost(a, b):
        C = sq_cost(a, b)
        P = sinkhorn_plan(C, eps=eps, n_iters=n_iters)
        return jnp.sum(P * C)

    return ot_cost(x, y) - 0.5 * (ot_cost(x, x) + ot_cost(y, y))


# ------------------------------------------------------------- public API


def remove_batch_associated_variables(
    data: pd.DataFrame,
    variable_types: dict,
    target_dict: dict,
    batch_dict: dict | None = None,
    mi_threshold: float = 0.1,
) -> pd.DataFrame:
    """Keep target-predictive features; drop batch-informative ones."""
    target_np = {k: np.asarray(v, dtype=float) for k, v in target_dict.items()}
    important = set()
    for var, target in target_np.items():
        if np.all(np.isnan(target)):
            continue
        ok = ~np.isnan(target)
        clf = (
            RandomForestClassifier()
            if variable_types[var] == "categorical"
            else RandomForestRegressor()
        )
        clf.fit(data[ok], target[ok])
        sel = SelectFromModel(clf, prefit=True)
        important.update(data.columns[sel.get_support()])

    if batch_dict is not None:
        for var, batch in batch_dict.items():
            batch = np.asarray(batch, dtype=float)
            if np.all(np.isnan(batch)):
                continue
            ok = ~np.isnan(batch)
            mi_fn = (
                mutual_info_classif
                if variable_types[var] == "categorical"
                else mutual_info_regression
            )
            mi = mi_fn(data[ok], batch[ok])
            important -= set(data.columns[mi > mi_threshold])
    # deterministic column order (set iteration order varies per process)
    return data[[c for c in data.columns if c in important]]


def generate_synthetic_batches(
    n_samples_per_batch: int = 150, n_features: int = 50
) -> Tuple[pd.DataFrame, np.ndarray]:
    b1 = np.random.normal(0.0, 1.0, (n_samples_per_batch, n_features))
    b2 = np.random.normal(2.0, 1.5, (n_samples_per_batch, n_features))
    data = pd.DataFrame(
        np.vstack([b1, b2]),
        columns=[f"feature_{i + 1}" for i in range(n_features)],
    )
    labels = np.array([0] * n_samples_per_batch + [1] * n_samples_per_batch)
    return data, labels


def optimal_transport_align(
    embeddings: pd.DataFrame,
    batch_labels,
    standardize_by_labels: bool = False,
    eps: float = 0.005,
):
    """Align two batches via optimal transport (barycentric projection).

    Batch-2 samples are replaced by their transport-plan projection onto
    batch 1 — same construction as the reference (utils.py:1830-1834), with
    the plan computed by the jit-compiled Sinkhorn solver.
    """
    labels = np.asarray(batch_labels)
    uniq = np.unique(labels)
    if len(uniq) != 2:
        raise ValueError("Optimal transport supports aligning exactly two batches.")
    i1 = np.where(labels == uniq[0])[0]
    i2 = np.where(labels == uniq[1])[0]
    x1 = jnp.asarray(embeddings.iloc[i1].to_numpy(), jnp.float32)
    x2 = jnp.asarray(embeddings.iloc[i2].to_numpy(), jnp.float32)

    # euclidean cost like ot.dist(metric="euclidean")
    d2 = jnp.maximum(
        jnp.sum(x1 * x1, 1)[:, None]
        + jnp.sum(x2 * x2, 1)[None, :]
        - 2 * x1 @ x2.T,
        0.0,
    )
    cost = jnp.sqrt(d2)
    cost = cost / jnp.maximum(jnp.max(cost), 1e-12)
    plan = sinkhorn_plan(cost, eps=eps, n_iters=1000)
    # rows of plan.T sum to 1/n2 -> normalize to a barycentric map
    weights = plan.T / jnp.maximum(jnp.sum(plan.T, axis=1, keepdims=True), 1e-12)
    aligned2 = np.asarray(weights @ x1)

    out = embeddings.to_numpy().copy()
    out[i2] = aligned2
    if standardize_by_labels:
        out[i1] = StandardScaler().fit_transform(out[i1])
        out[i2] = StandardScaler().fit_transform(out[i2])
    return (
        pd.DataFrame(out, columns=embeddings.columns, index=embeddings.index),
        pd.Series(batch_labels, index=embeddings.index, name="batch_labels"),
    )


def reciprocal_pca_mnn(
    embeddings: pd.DataFrame,
    batch_labels,
    n_components: int = 10,
    n_neighbors: int = 5,
    standardize_by_labels: bool = False,
    random_state=None,
):
    """rPCA + mutual-nearest-neighbor anchor alignment of two batches."""
    labels = np.asarray(batch_labels)
    uniq = np.unique(labels)
    if len(uniq) != 2:
        raise ValueError("Reciprocal PCA supports aligning exactly two batches.")
    i1 = np.where(labels == uniq[0])[0]
    i2 = np.where(labels == uniq[1])[0]
    x1 = embeddings.iloc[i1].to_numpy()
    x2 = embeddings.iloc[i2].to_numpy()
    if standardize_by_labels:
        x1 = (x1 - x1.mean(0)) / x1.std(0)
        x2 = (x2 - x2.mean(0)) / x2.std(0)

    pca1 = PCA(n_components=n_components, random_state=random_state)
    pca2 = PCA(n_components=n_components, random_state=random_state)
    p1 = pca1.fit_transform(x1)
    p2 = pca2.fit_transform(x2)
    x1_in_2 = pca2.transform(x1)
    x2_in_1 = pca1.transform(x2)

    nn1 = NearestNeighbors(n_neighbors=n_neighbors).fit(x2_in_1)
    nn2 = NearestNeighbors(n_neighbors=n_neighbors).fit(x1_in_2)
    _, idx1 = nn1.kneighbors(p1)
    _, idx2 = nn2.kneighbors(p2)

    anchors = [
        (i, j)
        for i, nbrs in enumerate(idx1)
        for j in nbrs
        if i in idx2[j]
    ]
    if not anchors:
        raise ValueError("No mutual nearest neighbors (MNN) found between batches.")
    anchors = np.asarray(anchors)
    A = np.linalg.pinv(p2[anchors[:, 1]]) @ p1[anchors[:, 0]]
    aligned2 = p2 @ A

    out = np.zeros((len(embeddings), n_components))
    out[i1] = p1
    out[i2] = aligned2
    return (
        pd.DataFrame(
            out,
            columns=[f"rPCA_{i + 1}" for i in range(n_components)],
            index=embeddings.index,
        ),
        pd.Series(batch_labels, index=embeddings.index, name="batch_labels"),
    )


def compute_correlation_loss(embeddings, batch_labels) -> jnp.ndarray:
    """Sum of |corr(embedding_dim, batch_label)| (utils.py:2121-2141)."""
    e = jnp.asarray(embeddings, jnp.float32)
    b = jnp.asarray(batch_labels, jnp.float32)
    e = (e - e.mean(axis=0, keepdims=True)) / (e.std(axis=0, keepdims=True) + 1e-8)
    b = (b - b.mean()) / (b.std() + 1e-8)
    cov = (b[None, :] @ e) / (e.shape[0] - 1)
    return jnp.sum(jnp.abs(cov))


def compute_transport_cost(embeddings, batch_labels, blur: float = 0.5):
    """Sinkhorn divergence between the two batches' embeddings."""
    e = jnp.asarray(embeddings, jnp.float32)
    b = np.asarray(batch_labels).astype(int)
    x = e[b == 0]
    y = e[b == 1]
    if x.shape[0] == 0 or y.shape[0] == 0:
        raise ValueError("Both batches must have at least one sample.")
    return sinkhorn_divergence(x, y, blur=blur)
