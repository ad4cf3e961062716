"""Regression tests for the round-3 periphery review findings.

Covers: baselines' missing-label (-1) filtering, inference reconstruction
of architecture-bearing config extras (gnn_readout) and batch_variables,
covariate reindexing against the trained one-hot columns at inference, and
the fine-tuner's final-fit epoch cap (reference main.py:625-659).
"""

import json
import os

import numpy as np
import pandas as pd
import pytest

from flexynesis_tpu.data.dataset import MultiOmicDataset, MultiOmicDatasetNW
from flexynesis_tpu.data.importer import DataImporter
from flexynesis_tpu.utils.synthetic import write_synthetic_folder

CFG = {
    "latent_dim": 16,
    "hidden_dim_factor": 0.3,
    "lr": 0.01,
    "supervisor_hidden_dim": 8,
    "epochs": 10,
    "batch_size": 32,
}


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    p = tmp_path_factory.mktemp("rvfix")
    write_synthetic_folder(str(p), n_train=100, n_test=50, seed=13)
    imp = DataImporter(str(p), ["gex", "cnv"], top_percentile=50, min_features=20)
    return imp.import_data()


def test_baselines_drop_unknown_categorical_labels():
    """-1 encodes a missing label (importer/inference convention): the
    baseline X/y extraction must drop those rows like evaluate_wrapper."""
    from flexynesis_tpu.utils.baselines import _prepare_xy

    ds = MultiOmicDataset(
        dat={"gex": np.random.default_rng(0).normal(size=(10, 4)).astype(np.float32)},
        ann={
            "subtype": np.array([0, 1, -1, 0, 1, -1, 0, 1, 0, 1], np.float32),
            "age": np.array([1, 2, -1, 4, 5, 6, 7, 8, 9, 10], np.float32),
        },
        variable_types={"subtype": "categorical", "age": "numerical"},
        features={"gex": [f"g{i}" for i in range(4)]},
        samples=[f"S{i}" for i in range(10)],
        label_mappings={"subtype": {0: "a", 1: "b"}},
    )
    X, y, idx = _prepare_xy(ds, "subtype")
    assert len(y) == 8 and (y >= 0).all()
    assert len(idx) == 8
    # numerical variables keep -1 (a legitimate value there)
    _, y_num, _ = _prepare_xy(ds, "age")
    assert len(y_num) == 10

    # an entirely unlabeled cohort raises a clear error instead of
    # crashing deep inside sklearn on empty arrays
    ds.ann["subtype"][:] = -1
    with pytest.raises(ValueError, match="No labeled samples"):
        _prepare_xy(ds, "subtype")


class TestReconstructExtras:
    def test_batch_variables_round_trip(self, tmp_path):
        """A model trained with batch_variables must reconstruct with its
        batch heads (previously silently dropped: the rebuilt module and
        the loaded params disagreed)."""
        from flexynesis_tpu.inference import (
            reconstruct_model,
            save_model,
            save_model_config,
        )
        from flexynesis_tpu.models.direct_pred import DirectPred
        from flexynesis_tpu.train.trainer import train_val_split

        rng = np.random.default_rng(2)
        n = 48
        train_ds = MultiOmicDataset(
            dat={"gex": rng.normal(size=(n, 8)).astype(np.float32)},
            ann={
                "subtype": rng.integers(0, 3, n).astype(np.float32),
                "batch": rng.integers(0, 2, n).astype(np.float32),
            },
            variable_types={"subtype": "categorical", "batch": "categorical"},
            features={"gex": [f"g{i}" for i in range(8)]},
            samples=[f"S{i}" for i in range(n)],
            label_mappings={
                "subtype": {i: f"grp{i}" for i in range(3)},
                "batch": {0: "b0", 1: "b1"},
            },
        )
        model = DirectPred(
            CFG, train_ds, target_variables=["subtype"],
            batch_variables=["batch"],
        )
        tr, va = train_val_split(n, 0.2)
        model.fit(train_ds, tr, va, lr=0.01, batch_size=16, max_epochs=3,
                  early_stop_patience=-1)
        assert "batch" in model.variables
        wp = str(tmp_path / "m.final_model.safetensors")
        cp = str(tmp_path / "m.final_model_config.json")
        save_model(model, wp)
        save_model_config(model, cp)
        assert json.load(open(cp))["batch_variables"] == ["batch"]

        artifacts = {"feature_lists": dict(train_ds.features), "label_encoders": {}}
        m2 = reconstruct_model(wp, cp, artifacts)
        assert m2.batch_variables == ["batch"]
        assert "batch" in m2.variables
        # loaded params carry head_batch and the module accepts them
        preds = m2.predict(train_ds)
        np.testing.assert_allclose(
            preds["subtype"], model.predict(train_ds)["subtype"], rtol=1e-5
        )

    def test_gnn_readout_round_trip(self, datasets, tmp_path):
        """gnn_readout='mean' changes the head architecture; reconstruction
        must rebuild the pooled head (previously fell back to 'flatten' and
        the params no longer matched the module)."""
        from flexynesis_tpu.inference import (
            reconstruct_model,
            save_model,
            save_model_config,
        )
        from flexynesis_tpu.models.gnn import GNN
        from flexynesis_tpu.train.trainer import train_val_split

        train_ds, _ = datasets
        rng = np.random.default_rng(0)
        genes = list(train_ds.features["gex"]) + list(train_ds.features["cnv"])
        edges = pd.DataFrame({
            "protein1": rng.choice(genes, 200),
            "protein2": rng.choice(genes, 200),
            "score": rng.random(200),
        })
        nw = MultiOmicDatasetNW(train_ds, edges)
        cfg = dict(CFG, node_embedding_dim=4, num_convs=1,
                   activation="relu", gnn_readout="mean")
        model = GNN(cfg, nw, target_variables=["subtype"])
        tr, va = train_val_split(len(train_ds), 0.2)
        model.fit(nw, tr, va, lr=0.01, batch_size=32, max_epochs=2,
                  early_stop_patience=-1)
        wp = str(tmp_path / "g.final_model.safetensors")
        cp = str(tmp_path / "g.final_model_config.json")
        save_model(model, wp)
        save_model_config(model, cp)

        m2 = reconstruct_model(wp, cp, {"feature_lists": {}, "label_encoders": {}})
        assert m2.config.get("gnn_readout") == "mean"
        preds = m2.predict(nw)
        np.testing.assert_allclose(
            preds["subtype"], model.predict(nw)["subtype"], rtol=1e-5
        )


def test_inference_covariates_reindexed_to_training_columns(tmp_path):
    """The test clin.csv lacks a category level seen in training: the
    rebuilt one-hot block must align to the TRAINING columns (zero-filled)
    instead of shrinking the model input."""
    from sklearn.preprocessing import OrdinalEncoder, StandardScaler

    from flexynesis_tpu.data.inference_importer import DataImporterInference

    feats = ["f0", "f1", "f2"]
    train_gex = pd.DataFrame(
        np.random.default_rng(0).normal(size=(6, 3)),
        columns=feats,
        index=[f"T{i}" for i in range(6)],
    )
    scaler = StandardScaler().fit(train_gex)
    enc = OrdinalEncoder().fit(np.array([["I"], ["II"], ["III"]]))
    artifacts = {
        "data_types": ["gex", "covariates"],
        "feature_lists": {
            "gex": feats,
            "covariates": ["stage_I", "stage_II", "stage_III"],
        },
        "transforms": {"gex": scaler},
        "label_encoders": {"stage": enc},
        "covariate_vars": ["stage"],
        "target_variables": ["stage"],
    }
    d = tmp_path / "test_only"
    d.mkdir()
    samples = [f"S{i}" for i in range(4)]
    gex = pd.DataFrame(
        np.random.default_rng(1).normal(size=(3, 4)),
        index=feats,
        columns=samples,
    )
    gex.to_csv(d / "gex.csv")
    # only stages I and II appear in the test cohort
    pd.DataFrame({"stage": ["I", "II", "I", "II"]}, index=samples).to_csv(
        d / "clin.csv"
    )

    ds = DataImporterInference(str(d), artifacts, verbose=False).import_data()
    cov = ds.dat["covariates"]
    assert cov.shape == (4, 3)
    assert ds.features["covariates"] == ["stage_I", "stage_II", "stage_III"]
    assert np.all(cov[:, 2] == 0.0)  # stage_III zero-filled
    assert np.all(cov[:, :2].sum(axis=1) == 1.0)  # one-hot intact

    # zero overlap with the trained columns (e.g. the covariate was
    # one-hot in training but parses numerical in the test clin.csv)
    # must raise, not silently feed an all-zero block to the model
    pd.DataFrame({"stage": [1, 2, 1, 2]}, index=samples).to_csv(d / "clin.csv")
    with pytest.raises(ValueError, match="trained columns"):
        DataImporterInference(str(d), artifacts, verbose=False).import_data()

    # the guard is PER covariate: a healthy numerical covariate must not
    # mask a categorical one whose levels are spelled differently (its
    # whole one-hot block would silently zero-fill)
    artifacts2 = dict(
        artifacts,
        covariate_vars=["age", "stage"],
        feature_lists={
            "gex": feats,
            "covariates": ["age", "stage_I", "stage_II", "stage_III"],
        },
    )
    pd.DataFrame(
        {"age": [50.0, 60.0, 70.0, 80.0],
         "stage": ["Stage I", "Stage II", "Stage I", "Stage II"]},
        index=samples,
    ).to_csv(d / "clin.csv")
    with pytest.raises(ValueError, match="'stage'"):
        DataImporterInference(str(d), artifacts2, verbose=False).import_data()


class TestUnlabeledCohort:
    """Inference on a cohort with no clin.csv (or all-unseen labels) must
    produce predictions with real class names and skip metrics, not crash
    (the reference requires a clin.csv even for unlabeled cohorts)."""

    def _dataset(self, with_ann):
        kw = dict(
            dat={"gex": np.zeros((4, 3), np.float32)},
            ann={"subtype": np.array([0, 1, -1, -1], np.float32)} if with_ann else {},
            variable_types={"subtype": "categorical"},
            features={"gex": ["g0", "g1", "g2"]},
            samples=[f"S{i}" for i in range(4)],
            label_mappings={"subtype": {0: "a", 1: "b", -1: "Unknown"}},
        )
        return MultiOmicDataset(**kw)

    def test_predicted_labels_without_ann(self):
        from flexynesis_tpu.utils.metrics import get_predicted_labels

        probs = np.array([[0.8, 0.2]] * 4, np.float32)
        tbl = get_predicted_labels({"subtype": probs}, self._dataset(False),
                                   "test", "DirectPred")
        assert len(tbl) == 8  # 4 samples x 2 classes
        assert tbl["known_label"].isna().all()
        assert set(tbl["predicted_label"]) == {"a"}

    def test_evaluate_wrapper_skips_missing_and_unseen(self):
        from flexynesis_tpu.utils.metrics import evaluate_wrapper

        probs = np.array([[0.8, 0.2]] * 4, np.float32)
        # no ann at all -> skipped
        stats = evaluate_wrapper("M", {"subtype": probs}, self._dataset(False))
        assert len(stats) == 0
        # all labels unseen (-1) -> skipped instead of crashing in sklearn
        ds = self._dataset(True)
        ds.ann["subtype"][:] = -1
        stats = evaluate_wrapper("M", {"subtype": probs}, ds)
        assert len(stats) == 0

    def test_dead_nan_class_presents_as_unknown(self):
        """Training labels with NaNs give the head a missing-label class
        (reference direct_pred.py:100 parity); its NaN mapping entry must
        surface as 'Unknown', not a NaN predicted_label."""
        from flexynesis_tpu.utils.metrics import get_predicted_labels

        ds = self._dataset(True)
        ds.label_mappings["subtype"] = {0: "a", 1: "b", 2: float("nan")}
        probs = np.array([[0.1, 0.2, 0.7]] * 4, np.float32)
        tbl = get_predicted_labels({"subtype": probs}, ds, "test", "M")
        assert set(tbl["predicted_label"]) == {"Unknown"}
        assert "Unknown" in set(tbl["class_label"])
        assert not tbl["class_label"].isna().any()

    def test_inference_importer_no_clin(self, tmp_path):
        from sklearn.preprocessing import OrdinalEncoder, StandardScaler

        from flexynesis_tpu.data.inference_importer import DataImporterInference

        feats = ["f0", "f1", "f2"]
        train = pd.DataFrame(
            np.random.default_rng(0).normal(size=(6, 3)), columns=feats
        )
        enc = OrdinalEncoder().fit(np.array([["x"], ["y"]]))
        artifacts = {
            "data_types": ["gex"],
            "feature_lists": {"gex": feats},
            "transforms": {"gex": StandardScaler().fit(train)},
            "label_encoders": {"subtype": enc},
            "target_variables": ["subtype"],
        }
        d = tmp_path / "noclin"
        d.mkdir()
        pd.DataFrame(
            np.random.default_rng(1).normal(size=(3, 4)),
            index=feats, columns=[f"S{i}" for i in range(4)],
        ).to_csv(d / "gex.csv")
        ds = DataImporterInference(str(d), artifacts, verbose=False).import_data()
        assert "subtype" not in ds.ann  # no ground truth
        # but class names and kind resolve from the trained encoder
        assert ds.variable_types["subtype"] == "categorical"
        assert ds.label_mappings["subtype"][0] == "x"
        assert ds.label_mappings["subtype"][-1] == "Unknown"


def test_covariate_column_groups_recorded_in_artifacts(tmp_path):
    """Training records {covariate -> its matrix columns} in the artifacts
    so the inference rebuild guard doesn't rely on name-prefix matching
    (ambiguous when one covariate's name prefixes another's). The groups
    are recorded POST-harmonize: a level present only in the training (or
    only the test) split never trains, and letting it satisfy the rebuild
    guard would mask an all-zero block for the covariate."""
    from flexynesis_tpu.inference import build_artifacts
    from flexynesis_tpu.utils.synthetic import write_synthetic_folder

    p = tmp_path / "cc"
    write_synthetic_folder(str(p), n_train=40, n_test=20, seed=5)
    imp = DataImporter(
        str(p), ["gex"], covariates=["age", "subtype"],
        top_percentile=50, min_features=10,
    )
    train_ds, _ = imp.import_data()
    groups = imp.covariate_columns
    assert groups["age"] == ["age"]  # numerical -> itself
    assert all(c.startswith("subtype_") for c in groups["subtype"])
    art = build_artifacts(imp, ["gex"], ["subtype"], covariates=["age", "subtype"])
    assert art["covariate_columns"] == groups
    # the recorded groups are exactly the TRAINED covariate columns
    assert set(sum(groups.values(), [])) == set(train_ds.features["covariates"])


def test_survival_baseline_raises_on_empty_cohort():
    """All-NaN survival columns must raise a clear ValueError, not crash
    deep inside sklearn (the CLI catches it and skips the comparison)."""
    from flexynesis_tpu.utils.baselines import (
        evaluate_baseline_survival_performance,
    )

    rng = np.random.default_rng(0)
    n = 20
    mk = lambda surv: MultiOmicDataset(
        dat={"gex": rng.normal(size=(n, 4)).astype(np.float32)},
        ann={"OS_MONTHS": surv, "OS_STATUS": surv},
        variable_types={"OS_MONTHS": "numerical", "OS_STATUS": "numerical"},
        features={"gex": [f"g{i}" for i in range(4)]},
        samples=[f"S{i}" for i in range(n)],
    )
    train = mk(rng.random(n).astype(np.float32) * 10)
    test = mk(np.full(n, np.nan, np.float32))
    with pytest.raises(ValueError, match="Too few samples"):
        evaluate_baseline_survival_performance(
            train, test, "OS_MONTHS", "OS_STATUS"
        )


def test_csv_to_h5_chunk_byte_cap(tmp_path):
    """A huge --chunksize must not produce an h5 chunk over the 32 MiB cap
    (h5py hard-rejects >4 GiB chunks)."""
    import h5py

    from flexynesis_tpu.csv_to_h5 import convert_csv_to_h5

    df = pd.DataFrame(
        np.random.default_rng(0).normal(size=(64, 8)).astype(np.float32),
        index=[f"g{i}" for i in range(64)],
        columns=[f"S{j}" for j in range(8)],
    )
    src = tmp_path / "m.csv"
    df.to_csv(src)
    out = convert_csv_to_h5(src, tmp_path / "m.h5", chunksize=10_000_000)
    with h5py.File(out) as f:
        chunks = f["matrix"].chunks
        assert chunks is not None
        assert int(np.prod(chunks)) * 4 <= 32 << 20
        np.testing.assert_allclose(
            f["matrix"][:], df.to_numpy(np.float32).T
        )


def test_finetuner_caps_final_fit_epochs(datasets):
    """The final full-data fit (no val split -> no early stopping) must run
    the winning cell's CV-averaged epoch count, not max_epochs (reference
    main.py:647-659)."""
    from flexynesis_tpu.models.direct_pred import DirectPred
    from flexynesis_tpu.train.finetune import FineTuner
    from flexynesis_tpu.train.trainer import train_val_split

    train_ds, _ = datasets
    model = DirectPred(CFG, train_ds, target_variables=["subtype"])
    tr, va = train_val_split(len(train_ds), 0.2)
    model.fit(train_ds, tr, va, lr=0.01, batch_size=32, max_epochs=2,
              early_stop_patience=-1)

    ft = FineTuner(model, train_ds, max_epochs=50)
    seen = {}
    orig = ft._fit_once

    def spy(lr, freeze, train_idx, val_idx, max_epochs=None):
        if val_idx is None:
            seen["final_max_epochs"] = max_epochs
        return orig(lr, freeze, train_idx, val_idx, max_epochs=max_epochs)

    ft._fit_once = spy
    ft._grid_parallel = lambda n, k: (
        0.1, 0.01, {"encoders": False, "supervisors": False}, 7.4,
    )
    ft.run_experiments(parallel=True)
    assert seen["final_max_epochs"] == 7
    assert ft.max_epochs == 50  # grid setting untouched by the final fit


def test_finetuner_parallel_stop_epoch_matches_sequential_semantics(monkeypatch):
    """The parallel grid reconstructs each cell's stop epoch as
    best_epoch + patience (capped at epochs_run), matching the sequential
    Trainer's epochs_run (= Lightning stopped_epoch) instead of reporting
    the raw best epoch (~patience epochs early)."""
    import types

    from flexynesis_tpu.parallel import trials as trials_mod
    from flexynesis_tpu.train.finetune import FineTuner

    k, n_combos = 2, 3  # 1 lr x 3 freeze configs
    T = n_combos * k

    def fake_grid_fit(model, dataset, **kw):
        best_epoch = np.full(T, 9)
        best_epoch[:k] = 5  # winning combo's folds peak at epoch 5
        loss = np.full(T, 0.6)
        loss[:k] = 0.4
        return {
            "best_val_loss": loss,
            "best_epoch": best_epoch,
            "epochs_run": 10,
        }

    monkeypatch.setattr(trials_mod, "vmapped_grid_fit", fake_grid_fit)

    ft = FineTuner.__new__(FineTuner)
    ft.early_stop_patience = 3
    ft.seed = 0
    ft.max_epochs = 50
    ft.learning_rates = [0.01]
    ft.dataset = None
    ft.model = types.SimpleNamespace(
        params={"encoder_gex": {"w": np.zeros(2)}, "head_y": {"w": np.zeros(2)}},
        batch_stats={},
        config={"lr": 0.01},
    )

    loss, lr, freeze, avg_ep = ft._grid_parallel(n=10, k=k)
    assert loss == pytest.approx(0.4)
    # winning cells peaked at 5 -> would stop at 5+3=8, not at best epoch 5
    assert avg_ep == pytest.approx(8.0)

    # patience disabled -> every cell ran the full epochs_run
    ft.early_stop_patience = -1
    _, _, _, avg_ep = ft._grid_parallel(n=10, k=k)
    assert avg_ep == pytest.approx(10.0)
