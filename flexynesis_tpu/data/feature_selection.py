"""Unsupervised Laplacian-score feature selection, computed on-device.

Capability parity with /root/reference/flexynesis/feature_selection.py:
``laplacian_score`` (:11-48), ``remove_redundant_features`` (:51-154) and
``filter_by_laplacian`` (:157-268) — but TPU-first:

* the kNN graph is built with a dense pairwise-distance matmul + top-k on
  device instead of sklearn's CPU ball-tree (one MXU matmul for the
  (n_samples x n_samples) Gram matrix);
* the Laplacian algebra ``diag(F^T L F) / diag(F^T D F)`` is fully dense XLA;
* the greedy correlation-redundancy scan, which is inherently sequential in
  the reference, is reformulated as an O(n^2) masked sweep over the
  device-computed correlation matrix (identical selection order/result).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


@partial(jax.jit, static_argnames=("k",))
def _laplacian_score_device(X: jnp.ndarray, k: int) -> jnp.ndarray:
    """Laplacian scores for each column (feature) of X (samples x features).

    Mirrors reference feature_selection.py:11-48: W = kNN connectivity graph
    (k neighbors + self), S = D^-1/2 W D^-1/2, L = I - S (normalized
    Laplacian), F = X - sum(S @ X) / n, score = diag(F'LF) / diag(F'DF).
    """
    n = X.shape[0]
    # pairwise squared distances via one Gram matmul (MXU-friendly)
    sq = jnp.sum(jnp.square(X), axis=1)
    d2 = sq[:, None] + sq[None, :] - 2.0 * jnp.dot(
        X, X.T, preferred_element_type=jnp.float32
    )
    d2 = jnp.maximum(d2, 0.0)
    # sklearn kneighbors_graph(include_self=True): self counts as one of the
    # k neighbors, so each row has k nonzeros including the self-loop.
    d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(-1.0)
    _, nbr_idx = jax.lax.top_k(-d2, k)  # k smallest distances incl. self
    W = jnp.zeros((n, n), X.dtype)
    rows = jnp.repeat(jnp.arange(n), k)
    W = W.at[rows, nbr_idx.reshape(-1)].set(1.0)
    # sklearn connectivity graphs are not symmetrized by the reference; keep W as-is.

    # degree used for S and D follows the reference: row sums INCLUDING the
    # self-loop (feature_selection.py:34)
    D_vec = jnp.sum(W, axis=1)
    d_inv_sqrt = 1.0 / jnp.sqrt(D_vec)
    S = W * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]

    # scipy csgraph.laplacian(W, normed=True) in contrast strips self-loops
    # and normalizes by IN-degree (column sums of the diagonal-free graph)
    w_nd = W.at[jnp.arange(n), jnp.arange(n)].set(0.0)
    d_in = jnp.sum(w_nd, axis=0)
    dn = jnp.sqrt(jnp.where(d_in == 0, 1.0, d_in))
    L = -w_nd / (dn[:, None] * dn[None, :])
    L = L.at[jnp.arange(n), jnp.arange(n)].set(jnp.where(d_in > 0, 1.0, 0.0))

    F = X - jnp.sum(jnp.dot(S, X, preferred_element_type=jnp.float32), axis=0) / n
    LF = jnp.dot(L, F, preferred_element_type=jnp.float32)
    DF = F * D_vec[:, None]
    num = jnp.sum(F * LF, axis=0)
    den = jnp.sum(F * DF, axis=0)
    return num / den


def laplacian_score(X: np.ndarray, k: int = 5, t: Optional[float] = None) -> np.ndarray:
    """Laplacian score per feature. Lower = better (captures data geometry).

    ``t`` switches to a dense heat-kernel affinity (reference :29-31).
    """
    X = np.asarray(X, dtype=np.float32)
    if t is not None:
        Xj = jnp.asarray(X)
        sq = jnp.sum(jnp.square(Xj), axis=1)
        d2 = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * Xj @ Xj.T, 0.0)
        W = jnp.exp(-d2 / t)
        n = X.shape[0]
        D_vec = jnp.sum(W, axis=1)
        d_inv_sqrt = 1.0 / jnp.sqrt(D_vec)
        S = W * d_inv_sqrt[:, None] * d_inv_sqrt[None, :]
        w_nd = W.at[jnp.arange(n), jnp.arange(n)].set(0.0)
        d_in = jnp.sum(w_nd, axis=0)
        dn = jnp.sqrt(jnp.where(d_in == 0, 1.0, d_in))
        L = -w_nd / (dn[:, None] * dn[None, :])
        L = L.at[jnp.arange(n), jnp.arange(n)].set(jnp.where(d_in > 0, 1.0, 0.0))
        F = Xj - jnp.sum(S @ Xj, axis=0) / n
        num = jnp.sum(F * (L @ F), axis=0)
        den = jnp.sum(F * (F * D_vec[:, None]), axis=0)
        return np.asarray(num / den)
    return np.asarray(_laplacian_score_device(jnp.asarray(X), int(k)))


@jax.jit
def _correlation_matrix(X: jnp.ndarray) -> jnp.ndarray:
    """np.corrcoef(X.T) equivalent: correlations between columns of X."""
    Xc = X - jnp.mean(X, axis=0, keepdims=True)
    cov = jnp.dot(Xc.T, Xc, preferred_element_type=jnp.float32)
    std = jnp.sqrt(jnp.diag(cov))
    return cov / (std[:, None] * std[None, :])


def laplacian_score_sharded(
    X: np.ndarray, k: int = 5, mesh=None, axis: str = "data"
) -> np.ndarray:
    """Laplacian scores with the FEATURE axis sharded across a device mesh.

    SURVEY.md §5.7: the reference's answer to wide feature matrices is
    subsampling; here each device scores its feature shard against the
    replicated (n_samples x n_samples) graph operators — the framework's
    "sequence parallel" analog. Falls back to the single-device kernel when
    no mesh is given.
    """
    from jax import shard_map as _shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    if mesh is None:
        return laplacian_score(X, k)
    X = np.asarray(X, dtype=np.float32)
    n, f = X.shape
    n_dev = mesh.shape[axis]
    f_pad = (-f) % n_dev
    Xp = np.pad(X, ((0, 0), (0, f_pad)))

    Xj = jnp.asarray(X)
    # graph operators depend only on samples — built once, replicated
    sq = jnp.sum(jnp.square(Xj), axis=1)
    d2 = jnp.maximum(
        sq[:, None] + sq[None, :] - 2.0 * Xj @ Xj.T, 0.0
    )
    d2 = d2.at[jnp.arange(n), jnp.arange(n)].set(-1.0)
    _, nbr_idx = jax.lax.top_k(-d2, k)
    W = jnp.zeros((n, n), jnp.float32)
    W = W.at[jnp.repeat(jnp.arange(n), k), nbr_idx.reshape(-1)].set(1.0)
    D_vec = jnp.sum(W, axis=1)
    dis = 1.0 / jnp.sqrt(D_vec)
    S = W * dis[:, None] * dis[None, :]
    w_nd = W.at[jnp.arange(n), jnp.arange(n)].set(0.0)
    d_in = jnp.sum(w_nd, axis=0)
    dn = jnp.sqrt(jnp.where(d_in == 0, 1.0, d_in))
    L = -w_nd / (dn[:, None] * dn[None, :])
    L = L.at[jnp.arange(n), jnp.arange(n)].set(jnp.where(d_in > 0, 1.0, 0.0))

    def score_shard(x_shard, S, L, D_vec):
        # each device sees (n_samples, f/n_dev); no collectives needed
        F = x_shard - jnp.sum(S @ x_shard, axis=0) / n
        num = jnp.sum(F * (L @ F), axis=0)
        den = jnp.sum(F * (F * D_vec[:, None]), axis=0)
        return num / den

    sharded = _shard_map(
        score_shard,
        mesh=mesh,
        in_specs=(P(None, axis), P(), P(), P()),
        out_specs=P(axis),
    )
    Xd = jax.device_put(
        jnp.asarray(Xp), NamedSharding(mesh, P(None, axis))
    )
    scores = jax.jit(sharded)(Xd, S, L, D_vec)
    return np.asarray(scores)[:f]


def remove_redundant_features(
    X: pd.DataFrame,
    laplacian_scores: np.ndarray,
    threshold: float,
    topN: Optional[int] = None,
) -> Tuple[pd.Index, pd.DataFrame]:
    """Greedy redundancy removal over a device-computed correlation matrix.

    Semantics match reference feature_selection.py:51-154: walk features in
    ascending Laplacian-score order; drop any feature whose |corr| with an
    already-selected feature exceeds ``threshold``; then top up from the
    dropped set (best score first) until ``topN`` features are selected.
    """
    corr = np.abs(
        np.asarray(_correlation_matrix(jnp.asarray(X.values, dtype=jnp.float32)))
    )
    ranked = np.argsort(np.asarray(laplacian_scores))

    selected: list[int] = []
    redundant: dict[int, dict] = {}
    for idx in ranked:
        if selected:
            cors = corr[idx, selected]
            j = int(np.argmax(cors))
            if cors[j] > threshold:
                redundant[int(idx)] = {
                    "correlated_with": selected[j],
                    "correlation_score": float(cors[j]),
                }
                continue
        selected.append(int(idx))

    if topN is not None and len(selected) < topN:
        for idx in sorted(redundant.keys(), key=lambda i: laplacian_scores[i]):
            if len(selected) >= topN:
                break
            selected.append(idx)
            del redundant[idx]

    if redundant:
        red_df = pd.DataFrame(
            [
                {
                    "feature": X.columns[i],
                    "correlated_with": X.columns[v["correlated_with"]],
                    "correlation_score": v["correlation_score"],
                }
                for i, v in redundant.items()
            ]
        )
    else:
        red_df = pd.DataFrame()
    return X.columns[selected], red_df


def filter_by_laplacian(
    X: pd.DataFrame,
    layer: str,
    k: int = 5,
    t: Optional[float] = None,
    topN: int = 100,
    correlation_threshold: float = 0.9,
) -> Tuple[pd.DataFrame, pd.DataFrame]:
    """Select the topN features by Laplacian score with redundancy filtering.

    Reference feature_selection.py:157-268. Returns (X_selected, feature_log)
    where feature_log has columns feature / laplacian_score / (correlated_with
    / correlation_score when redundancy pruning ran) / selected.
    """
    print(
        f"[INFO] Laplacian feature selection (TPU) for layer '{layer}': "
        f"{X.shape[1]} features, {X.shape[0]} samples"
    )
    feature_log = pd.DataFrame({"feature": X.columns, "laplacian_score": np.nan})
    if topN >= X.shape[1]:
        print("[INFO] Requested more features than present; skipping selection.")
        return X, feature_log

    scores = laplacian_score(X.values, k, t)
    feature_log = pd.DataFrame({"feature": X.columns, "laplacian_score": scores})

    sorted_indices = np.argsort(scores)
    selected_idx = sorted_indices[:topN]
    selected_features = X.columns[selected_idx]

    if correlation_threshold < 1:
        # reference evaluates redundancy on the topN candidate block
        selected_features, red_df = remove_redundant_features(
            X[X.columns[selected_idx]],
            scores[selected_idx],
            correlation_threshold,
            topN,
        )
        selected_features = selected_features[:topN]
        if not red_df.empty:
            feature_log = pd.merge(feature_log, red_df, on="feature", how="outer")

    X_selected = X[selected_features]
    feature_log["selected"] = False
    feature_log.loc[feature_log["feature"].isin(selected_features), "selected"] = True
    return X_selected, feature_log
