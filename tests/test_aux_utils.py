"""Clustering, batch-correction, plotting and co-expression utilities."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from flexynesis_tpu.utils.batch_correction import (
    compute_correlation_loss,
    compute_transport_cost,
    generate_synthetic_batches,
    optimal_transport_align,
    reciprocal_pca_mnn,
    remove_batch_associated_variables,
)
from flexynesis_tpu.utils.clustering import (
    compute_ami_ari,
    get_optimal_clusters,
    k_means_clustering,
    louvain_clustering,
    scale_and_standardize_by_labels,
)


def make_clusters(rng, n_per=40, k=3, d=8, sep=6.0):
    centers = rng.normal(0, sep, (k, d))
    X = np.vstack([centers[i] + rng.normal(0, 1, (n_per, d)) for i in range(k)])
    y = np.repeat(np.arange(k), n_per)
    return X, y


class TestClustering:
    def test_kmeans_and_optimal_k(self, rng):
        X, y = make_clusters(rng)
        labels, model = k_means_clustering(X, 3)
        assert compute_ami_ari(labels, y)["ami"] > 0.9
        opt_labels, opt_k, scores = get_optimal_clusters(X, 2, 6)
        assert opt_k == 3
        assert {"k", "silhouette_score"} <= set(scores.columns)

    def test_louvain(self, rng):
        X, y = make_clusters(rng, n_per=25)
        labels, G, partition = louvain_clustering(X, k=10)
        assert compute_ami_ari(labels, y)["ari"] > 0.8

    def test_scale_by_labels(self, rng):
        X = np.vstack([rng.normal(5, 2, (30, 4)), rng.normal(-3, 0.5, (30, 4))])
        lab = np.repeat([0, 1], 30)
        Xs = scale_and_standardize_by_labels(X, lab)
        for g in (0, 1):
            np.testing.assert_allclose(Xs[lab == g].mean(0), 0, atol=1e-10)
            np.testing.assert_allclose(Xs[lab == g].std(0), 1, atol=1e-10)


class TestBatchCorrection:
    def test_ot_align_reduces_shift(self):
        data, labels = generate_synthetic_batches(80, 10)
        aligned, _ = optimal_transport_align(data, labels)
        before = abs(
            data[labels == 0].mean().mean() - data[labels == 1].mean().mean()
        )
        after = abs(
            aligned[labels == 0].mean().mean() - aligned[labels == 1].mean().mean()
        )
        assert after < before * 0.2

    def test_rpca_mnn_runs(self):
        data, labels = generate_synthetic_batches(60, 20)
        aligned, _ = reciprocal_pca_mnn(data, labels, n_components=5)
        assert aligned.shape == (120, 5)

    def test_correlation_loss_detects_batch_effect(self):
        data, labels = generate_synthetic_batches(60, 10)
        biased = float(compute_correlation_loss(data.values, labels))
        rng = np.random.default_rng(0)
        clean = float(
            compute_correlation_loss(rng.normal(size=(120, 10)), labels)
        )
        assert biased > clean * 3

    def test_transport_cost_orders_batches(self):
        data, labels = generate_synthetic_batches(50, 6)
        shifted = float(compute_transport_cost(data.values, labels))
        same = float(
            compute_transport_cost(
                np.vstack([data.values[labels == 0]] * 2),
                labels,
            )
        )
        assert shifted > same

    def test_remove_batch_associated_variables(self, rng):
        n = 120
        target = rng.integers(0, 2, n).astype(float)
        batch = rng.integers(0, 2, n).astype(float)
        df = pd.DataFrame({
            "good": target * 2 + rng.normal(0, 0.3, n),
            "batchy": batch * 3 + rng.normal(0, 0.3, n),
            "noise": rng.normal(0, 1, n),
        })
        out = remove_batch_associated_variables(
            df, {"t": "categorical", "b": "categorical"},
            {"t": target}, {"b": batch},
        )
        assert "good" in out.columns
        assert "batchy" not in out.columns


class TestPlotting:
    def test_all_plots_render(self, rng):
        from flexynesis_tpu.utils import plotting as P

        X, y = make_clusters(rng, n_per=20)
        assert P.plot_dim_reduced(X, y.astype(str)) is not None
        t = rng.exponential(5 + 10 * y)
        assert P.plot_kaplan_meier_curves(t, np.ones_like(t), y.astype(str)) is not None
        assert P.plot_scatter(rng.normal(size=30), rng.normal(size=30)) is not None
        assert P.plot_boxplot(y.astype(str), X[:, 0]) is not None
        probs = rng.dirichlet(np.ones(3), size=len(y))
        assert P.plot_roc_curves(y, probs) is not None
        assert P.plot_pr_curves(y, probs) is not None
        assert P.plot_label_concordance_heatmap(y, (y + 1) % 3) is not None

    def test_hazard_forest_plot(self, rng):
        from flexynesis_tpu.utils.plotting import plot_hazard_ratios
        from flexynesis_tpu.utils.survival import CoxPH

        n = 100
        x = rng.normal(size=n)
        df = pd.DataFrame({
            "x": x, "z": rng.normal(size=n),
            "time": rng.exponential(np.exp(-x)), "event": np.ones(n),
        })
        m = CoxPH().fit(df, "time", "event")
        assert plot_hazard_ratios(m) is not None


class TestCoexpression:
    def test_network_recovers_correlated_genes(self, rng, tmp_path):
        from flexynesis_tpu.coexpression import generate_coexpression_network

        n_samples = 50
        base = rng.normal(size=n_samples)
        expr = pd.DataFrame(
            {
                f"S{i}": 0 for i in range(n_samples)
            }, index=["g1", "g2", "g3"], dtype=float,
        )
        expr.loc["g1"] = base
        expr.loc["g2"] = base + rng.normal(0, 0.1, n_samples)
        expr.loc["g3"] = rng.normal(size=n_samples)
        inp = tmp_path / "expr.csv"
        out = tmp_path / "net.csv"
        expr.to_csv(inp)
        net = generate_coexpression_network(
            str(inp), str(out), method="pearson",
            correlation_threshold=0.5, top_k=2,
        )
        pairs = set(map(tuple, net[["GeneA", "GeneB"]].values))
        assert ("g1", "g2") in pairs or ("g2", "g1") in pairs
        assert not any("g3" in p for p in pairs)


class TestBaselines:
    @pytest.fixture(scope="class")
    def split(self, tmp_path_factory):
        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.utils.synthetic import write_synthetic_folder

        p = tmp_path_factory.mktemp("bl")
        write_synthetic_folder(str(p), n_train=80, n_test=40, seed=15)
        imp = DataImporter(str(p), ["gex"], top_percentile=50, min_features=20)
        return imp.import_data()

    def test_survival_baseline(self, split):
        from flexynesis_tpu.utils.baselines import (
            evaluate_baseline_survival_performance,
        )

        train, test = split
        stats, preds = evaluate_baseline_survival_performance(
            train, test, "OS_MONTHS", "OS_STATUS", n_folds=3, n_jobs=2
        )
        assert stats.iloc[0]["metric"] == "cindex"
        assert 0.0 <= stats.iloc[0]["value"] <= 1.0
        assert (preds["method"] == "RandomSurvivalForest").all()

    def test_classifier_baseline_with_pca(self, split):
        from flexynesis_tpu.utils.baselines import evaluate_baseline_performance

        train, test = split
        stats, preds = evaluate_baseline_performance(
            train, test, "subtype", ["RandomForest"],
            n_folds=3, n_jobs=2, use_pca=True, n_components=10,
        )
        acc = stats.query("metric=='balanced_acc'")["value"].iloc[0]
        assert acc > 0.8  # synthetic signal is easy

    def test_regression_baseline(self, split):
        from flexynesis_tpu.utils.baselines import evaluate_baseline_performance

        train, test = split
        stats, _ = evaluate_baseline_performance(
            train, test, "age", ["SVM"], n_folds=3, n_jobs=2
        )
        assert (stats["method"] == "SVMRegressor").all()
