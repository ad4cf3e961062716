"""End-to-end DirectPred slice: import -> train -> predict -> evaluate.

Mirrors the reference CI smoke run (models-template.yml:53-63) on synthetic
data: classification + survival multi-task training must learn signal."""

import jax
import numpy as np
import pytest

from flexynesis_tpu.data.importer import DataImporter
from flexynesis_tpu.models.direct_pred import DirectPred
from flexynesis_tpu.train.trainer import Trainer, train_val_split
from flexynesis_tpu.utils.metrics import evaluate_wrapper, get_predicted_labels
from flexynesis_tpu.utils.synthetic import write_synthetic_folder

CONFIG = {
    "latent_dim": 32,
    "hidden_dim_factor": 0.3,
    "lr": 0.01,
    "supervisor_hidden_dim": 16,
    "epochs": 60,
    "batch_size": 32,
}


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    p = tmp_path_factory.mktemp("e2e")
    write_synthetic_folder(str(p), n_train=120, n_test=60, seed=3)
    imp = DataImporter(
        str(p), ["gex", "cnv"], top_percentile=50, min_features=20
    )
    return imp.import_data()


def _fit(model, train_ds, epochs=60, patience=-1):
    model.init_params(train_ds)
    tr_idx, va_idx = train_val_split(len(train_ds), 0.2)
    trainer = Trainer(model.loss_fn, lr=CONFIG["lr"])
    res = trainer.fit(
        model.params,
        model.batch_stats,
        model.make_batch(train_ds, tr_idx),
        model.make_batch(train_ds, va_idx),
        n_samples=len(tr_idx),
        batch_size=CONFIG["batch_size"],
        max_epochs=epochs,
        early_stop_patience=patience,
        rng=jax.random.key(0),
    )
    model.params, model.batch_stats = res.params, res.batch_stats
    return res


class TestDirectPredE2E:
    def test_train_and_evaluate(self, datasets):
        train_ds, test_ds = datasets
        model = DirectPred(
            CONFIG, train_ds, target_variables=["subtype"],
            surv_event_var="OS_STATUS", surv_time_var="OS_MONTHS",
        )
        res = _fit(model, train_ds)
        assert np.isfinite(res.val_loss)
        # learned something
        first = res.history["val_loss"][0]
        assert res.val_loss < first

        preds = model.predict(test_ds)
        assert set(preds) == {"subtype", "OS_STATUS"}
        n_classes = model.output_dims["subtype"]
        assert preds["subtype"].shape == (len(test_ds), n_classes)
        np.testing.assert_allclose(preds["subtype"].sum(axis=1), 1.0, atol=1e-5)

        stats = evaluate_wrapper(
            "DirectPred", preds, test_ds,
            surv_event_var="OS_STATUS", surv_time_var="OS_MONTHS",
        )
        bal_acc = stats.query("var=='subtype' and metric=='balanced_acc'")[
            "value"
        ].iloc[0]
        assert bal_acc > 0.8, f"balanced_acc {bal_acc} too low — no learning?"
        cindex = stats.query("metric=='cindex'")["value"].iloc[0]
        assert cindex > 0.5

        emb = model.transform(test_ds)
        assert emb.shape == (len(test_ds), CONFIG["latent_dim"])
        assert list(emb.columns[:2]) == ["E0", "E1"]

        table = get_predicted_labels(preds, test_ds, "test", "DirectPred")
        assert {"sample_id", "variable", "probability"} <= set(table.columns)

    def test_early_stopping_triggers(self, datasets):
        train_ds, _ = datasets
        model = DirectPred(CONFIG, train_ds, target_variables=["subtype"])
        res = _fit(model, train_ds, epochs=200, patience=5)
        assert res.epochs_run < 200

    def test_single_modality_no_fusion(self, datasets):
        train_ds, test_ds = datasets
        sub = train_ds  # model on one layer only
        model = DirectPred(
            CONFIG,
            type(sub)(
                dat={"gex": sub.dat["gex"]},
                ann=sub.ann,
                variable_types=sub.variable_types,
                features={"gex": sub.features["gex"]},
                samples=sub.samples,
                label_mappings=sub.label_mappings,
            ),
            target_variables=["subtype"],
        )
        assert "fusion_block" not in jax.tree_util.tree_leaves_with_path(
            model.init_params(sub)[0]
        ).__repr__()

    def test_regression_target(self, datasets):
        train_ds, test_ds = datasets
        model = DirectPred(CONFIG, train_ds, target_variables=["age"])
        # raw age targets (~55 mean) through the reference's bias-free
        # regression head (modules.py:129) need more steps to reach signal
        res = _fit(model, train_ds, epochs=250)
        preds = model.predict(test_ds)
        assert preds["age"].shape[0] == len(test_ds)
        stats = evaluate_wrapper("DirectPred", preds, test_ds)
        r = stats.query("metric=='pearson_corr'")["value"].iloc[0]
        assert r > 0.3


class TestChunkedEval:
    def test_chunked_forward_matches_full(self, datasets):
        train_ds, test_ds = datasets
        model = DirectPred(CONFIG, train_ds, target_variables=["subtype"])
        model.init_params(train_ds)
        full = model.predict(test_ds)["subtype"]
        model.EVAL_CHUNK = 16  # force chunking
        chunked = model.predict(test_ds)["subtype"]
        np.testing.assert_allclose(full, chunked, rtol=1e-5, atol=1e-6)

    def test_ragged_tail_reuses_one_program(self, datasets):
        """The ragged tail chunk is zero-padded to EVAL_CHUNK so every chunk
        runs the SAME compiled program (a distinct tail shape costs 30-120s
        per cohort size through the remote-compile tunnel)."""
        train_ds, test_ds = datasets
        model = DirectPred(CONFIG, train_ds, target_variables=["subtype"])
        model.init_params(train_ds)
        n = len(test_ds)
        model.EVAL_CHUNK = 16 if n % 16 else 17  # guarantee a ragged tail
        preds = model.predict(test_ds)["subtype"]
        assert preds.shape[0] == n
        assert model._eval_jit._cache_size() == 1


class TestVariantConfigs:
    def test_batch_variables_add_heads(self, datasets):
        train_ds, _ = datasets
        model = DirectPred(
            CONFIG, train_ds, target_variables=["subtype"],
            batch_variables=["age"],
        )
        model.init_params(train_ds)
        # batch variable gets its own head + log-var (reference
        # direct_pred.py:50-64)
        assert "head_age" in model.params
        assert "log_var_age" in model.params
        batch = model.make_batch(train_ds, np.arange(32))
        total, (losses, _) = model.loss_fn(
            model.params, model.batch_stats, batch, jax.random.key(0), True
        )
        assert "age" in losses and "subtype" in losses

    def test_no_loss_weighting(self, datasets):
        train_ds, _ = datasets
        model = DirectPred(
            CONFIG, train_ds, target_variables=["subtype", "age"],
            use_loss_weighting=False,
        )
        model.init_params(train_ds)
        assert not any(k.startswith("log_var") for k in model.params)
        batch = model.make_batch(train_ds, np.arange(32))
        total, (losses, _) = model.loss_fn(
            model.params, model.batch_stats, batch, jax.random.key(0), True
        )
        np.testing.assert_allclose(
            float(total), float(sum(np.asarray(v) for v in losses.values())),
            rtol=1e-6,
        )
