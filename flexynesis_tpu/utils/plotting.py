"""Plotting helpers (matplotlib/seaborn; the reference's plotnine plots are
re-expressed in matplotlib — plotnine is not a dependency here).

Capability parity with /root/reference/flexynesis/utils.py:
``plot_dim_reduced`` (:115-174), ``plot_kaplan_meier_curves`` (:177-294),
``plot_scatter`` (:297-346), ``plot_boxplot`` (:349-410),
``plot_roc_curves`` (:536-591), ``plot_pr_curves`` (:593-648),
``plot_label_concordance_heatmap`` (:1637-1660),
``plot_hazard_ratios`` (:1351-1416), ``get_color_mapping`` (:73-113).

UMAP is optional (not shipped); ``plot_dim_reduced(method='umap')`` falls
back to t-SNE with a warning.
"""

from __future__ import annotations

import warnings
from typing import Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np
import pandas as pd

from .survival import KaplanMeier, multivariate_logrank_test


def get_color_mapping(labels):
    """Stable label -> color mapping over tab20.

    NaN labels map to the "NA" category like the reference
    (utils.py:73-113 fillna('NA')) — unlabeled samples stay visible in
    categorical plots instead of silently vanishing."""
    uniq = pd.unique(pd.Series(labels).fillna("NA"))
    cmap = plt.get_cmap("tab20")
    return {lb: cmap(i % 20) for i, lb in enumerate(uniq)}


def plot_dim_reduced(
    matrix,
    labels,
    method: str = "pca",
    color_type: str = "categorical",
    scatter_kwargs: Optional[dict] = None,
):
    """2D embedding scatter (PCA / UMAP->t-SNE fallback), colored by labels."""
    X = np.asarray(matrix, dtype=float)
    if method == "pca":
        from sklearn.decomposition import PCA

        emb = PCA(n_components=2).fit_transform(X)
        xlab, ylab = "PC1", "PC2"
    elif method in ("umap", "tsne"):
        if method == "umap":
            try:
                import umap  # noqa: F401

                emb = umap.UMAP(n_components=2).fit_transform(X)
            except ImportError:
                warnings.warn(
                    "umap-learn is not installed; falling back to t-SNE."
                )
                method = "tsne"
        if method == "tsne":
            from sklearn.manifold import TSNE

            emb = TSNE(
                n_components=2, perplexity=min(30, max(len(X) // 4, 2))
            ).fit_transform(X)
        xlab, ylab = "dim1", "dim2"
    else:
        raise ValueError(f"Unknown method: {method}")

    fig, ax = plt.subplots(figsize=(7, 6))
    labels = pd.Series(np.asarray(labels, dtype=object)).fillna("NA")
    kwargs = dict(s=18, alpha=0.8)
    kwargs.update(scatter_kwargs or {})
    if color_type == "categorical":
        colors = get_color_mapping(labels)
        for lb, c in colors.items():
            m = (labels == lb).values
            ax.scatter(emb[m, 0], emb[m, 1], color=c, label=str(lb), **kwargs)
        ax.legend(loc="best", fontsize=8)
    else:
        vals = pd.to_numeric(labels, errors="coerce")
        sc = ax.scatter(emb[:, 0], emb[:, 1], c=vals, cmap="viridis", **kwargs)
        fig.colorbar(sc, ax=ax)
    ax.set_xlabel(xlab)
    ax.set_ylabel(ylab)
    fig.tight_layout()
    return fig


def plot_kaplan_meier_curves(durations, events, categorical_variable, title=None):
    """Per-group KM curves + multivariate log-rank p-value annotation."""
    durations = np.asarray(durations, dtype=float)
    events = np.asarray(events, dtype=float)
    # NaN-labeled samples become the "NA" group, so the plotted curves and
    # the annotated log-rank test cover the same groups
    groups = pd.Series(np.asarray(categorical_variable, dtype=object)).fillna("NA")

    fig, ax = plt.subplots(figsize=(7, 6))
    colors = get_color_mapping(groups)
    for lb, color in colors.items():
        m = (groups == lb).values
        if m.sum() == 0:
            continue
        km = KaplanMeier().fit(durations[m], events[m])
        t = np.concatenate([[0], km.timeline])
        s = np.concatenate([[1.0], km.survival])
        ax.step(t, s, where="post", label=f"{lb} (n={int(m.sum())})", color=color)
    res = multivariate_logrank_test(durations, groups.values, events)
    ax.set_xlabel("Time")
    ax.set_ylabel("Survival probability")
    ax.set_ylim(0, 1.02)
    ax.legend(loc="best", fontsize=8)
    ax.set_title(
        (title or "Kaplan-Meier") + f"  (log-rank p={res.p_value:.3g})"
    )
    fig.tight_layout()
    return fig


def plot_scatter(true_values, predicted_values):
    """True vs predicted scatter with fit line and Pearson r annotation."""
    from scipy.stats import linregress

    y, yh = np.asarray(true_values, float), np.asarray(predicted_values, float)
    m = np.isfinite(y) & np.isfinite(yh)
    lr = linregress(y[m], yh[m])
    fig, ax = plt.subplots(figsize=(6, 6))
    ax.scatter(y[m], yh[m], s=16, alpha=0.7)
    xs = np.linspace(y[m].min(), y[m].max(), 10)
    ax.plot(xs, lr.intercept + lr.slope * xs, color="red")
    ax.set_xlabel("True values")
    ax.set_ylabel("Predicted values")
    ax.set_title(f"r={lr.rvalue:.3f}, p={lr.pvalue:.3g}")
    fig.tight_layout()
    return fig


def plot_boxplot(categorical_x, numerical_y, title_x="Categories",
                 title_y="Values", jittersize=4):
    fig, ax = plt.subplots(figsize=(7, 5))
    x = pd.Series(np.asarray(categorical_x, dtype=object))
    y = np.asarray(numerical_y, dtype=float)
    uniq = [u for u in pd.unique(x) if not pd.isna(u)]
    data = [y[(x == u).values] for u in uniq]
    ax.boxplot(data, tick_labels=[str(u) for u in uniq], showfliers=False)
    rng = np.random.default_rng(0)
    for i, d in enumerate(data):
        ax.scatter(
            np.full(len(d), i + 1) + rng.uniform(-0.12, 0.12, len(d)),
            d, s=jittersize, alpha=0.6, color="black",
        )
    ax.set_xlabel(title_x)
    ax.set_ylabel(title_y)
    fig.tight_layout()
    return fig


def plot_roc_curves(y_true, y_probs):
    from sklearn.metrics import roc_auc_score, roc_curve

    y_true = np.asarray(y_true)
    y_probs = np.asarray(y_probs)
    fig, ax = plt.subplots(figsize=(6, 6))
    n_classes = y_probs.shape[1]
    if n_classes == 2:
        fpr, tpr, _ = roc_curve(y_true, y_probs[:, 1])
        auc = roc_auc_score(y_true, y_probs[:, 1])
        ax.plot(fpr, tpr, label=f"Class 1 (AUC={auc:.2f})")
    else:
        for c in range(n_classes):
            yb = (y_true == c).astype(int)
            if yb.sum() == 0 or yb.sum() == len(yb):
                continue
            fpr, tpr, _ = roc_curve(yb, y_probs[:, c])
            auc = roc_auc_score(yb, y_probs[:, c])
            ax.plot(fpr, tpr, label=f"Class {c} (AUC={auc:.2f})")
    ax.plot([0, 1], [0, 1], "k--", lw=0.8)
    ax.set_xlabel("False positive rate")
    ax.set_ylabel("True positive rate")
    ax.set_title("ROC Curve")
    ax.legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_pr_curves(y_true, y_probs):
    from sklearn.metrics import average_precision_score, precision_recall_curve

    y_true = np.asarray(y_true)
    y_probs = np.asarray(y_probs)
    fig, ax = plt.subplots(figsize=(6, 6))
    n_classes = y_probs.shape[1]
    classes = [1] if n_classes == 2 else range(n_classes)
    for c in classes:
        yb = (y_true == c).astype(int) if n_classes > 2 else y_true
        probs = y_probs[:, c]
        if np.unique(yb).size < 2:
            continue
        prec, rec, _ = precision_recall_curve(yb, probs)
        ap = average_precision_score(yb, probs)
        ax.plot(rec, prec, label=f"Class {c} (AP={ap:.2f})")
    ax.set_xlabel("Recall")
    ax.set_ylabel("Precision")
    ax.set_title("Precision-Recall Curve")
    ax.legend(fontsize=8)
    fig.tight_layout()
    return fig


def plot_label_concordance_heatmap(labels1, labels2, figsize=(12, 10)):
    import seaborn as sns

    df = pd.crosstab(pd.Series(labels1, name="labels1"),
                     pd.Series(labels2, name="labels2"), normalize="index")
    fig, ax = plt.subplots(figsize=figsize)
    sns.heatmap(df, annot=True, fmt=".2f", cmap="viridis", ax=ax)
    fig.tight_layout()
    return fig


def plot_hazard_ratios(cox_model):
    """Forest plot of hazard ratios with 95% CI + significance stars."""

    def significance(p):
        return "***" if p < 0.001 else "**" if p < 0.01 else "*" if p < 0.05 else ""

    summary = cox_model.summary.sort_values("exp(coef)")
    hr = summary["exp(coef)"]
    lo = summary["exp(coef) lower 95%"]
    hi = summary["exp(coef) upper 95%"]
    p = summary["p"]
    ypos = np.arange(len(summary))

    fig, ax = plt.subplots(figsize=(7, max(2, 0.4 * len(summary) + 1)))
    ax.errorbar(
        hr, ypos,
        xerr=[hr - lo, hi - hr],
        fmt="o", color="black", ecolor="gray", capsize=3,
    )
    for y, (h, pv) in enumerate(zip(hr, p)):
        ax.annotate(
            significance(pv), (h, y), textcoords="offset points",
            xytext=(0, 6), ha="center", fontsize=10, color="red",
        )
    ax.axvline(1.0, color="blue", linestyle="--", lw=0.8)
    ax.set_yticks(ypos)
    ax.set_yticklabels(summary.index)
    ax.set_xlabel("Hazard ratio (95% CI)")
    ax.set_title("Hazard ratios")
    fig.tight_layout()
    return fig
