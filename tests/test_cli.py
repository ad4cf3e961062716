"""End-to-end CLI tests mirroring the reference CI matrix
(models-template.yml:53-105): train with --hpo_iter 1, then reload the
saved model in inference mode."""

import json
import os

import numpy as np
import pandas as pd
import pytest

from flexynesis_tpu.__main__ import main
from flexynesis_tpu.utils.synthetic import write_synthetic_folder


@pytest.fixture(scope="module")
def data_path(tmp_path_factory):
    p = tmp_path_factory.mktemp("cli_data")
    write_synthetic_folder(str(p), n_train=80, n_test=40, seed=21)
    return str(p)


def _run(data_path, outdir, extra):
    args = [
        "--data_path", data_path,
        "--hpo_iter", "1",
        "--epochs_override", "5",
    ]
    # no --epochs flag exists; shrink via config file instead
    args = [
        "--data_path", data_path,
        "--hpo_iter", "1",
        "--outdir", outdir,
        "--prefix", "job",
        "--features_top_percentile", "50",
        "--features_min", "20",
        "--early_stop_patience", "3",
        "--config_path", os.path.join(outdir, "hpo.yaml"),
    ] + extra
    return main(args)


def _write_small_space(outdir, model, gnn=False):
    os.makedirs(outdir, exist_ok=True)
    dims = [
        {"type": "Integer", "low": 16, "high": 16, "name": "latent_dim"},
        {"type": "Real", "low": 0.3, "high": 0.3, "name": "hidden_dim_factor"},
        {"type": "Real", "low": 0.01, "high": 0.01, "name": "lr"},
        {"type": "Integer", "low": 8, "high": 8, "name": "supervisor_hidden_dim"},
        {"type": "Categorical", "categories": [10], "name": "epochs"},
        {"type": "Categorical", "categories": [32], "name": "batch_size"},
    ]
    if gnn:
        dims += [
            {"type": "Integer", "low": 4, "high": 4, "name": "node_embedding_dim"},
            {"type": "Integer", "low": 1, "high": 1, "name": "num_convs"},
            {"type": "Categorical", "categories": ["relu"], "name": "activation"},
        ]
    import yaml

    with open(os.path.join(outdir, "hpo.yaml"), "w") as fh:
        yaml.safe_dump({model: dims}, fh)


class TestCLITrainInfer:
    def test_directpred_train_then_infer(self, data_path, tmp_path):
        outdir = str(tmp_path / "out")
        _write_small_space(outdir, "DirectPred")
        rc = _run(data_path, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex,cnv",
            "--target_variables", "subtype",
            "--safetensors",
        ])
        assert rc == 0
        for f in (
            "job.stats.csv", "job.predicted_labels.csv",
            "job.embeddings_train.csv", "job.embeddings_test.csv",
            "job.final_model.safetensors", "job.final_model_config.json",
            "job.artifacts.json",
            "job.feature_importance.IntegratedGradients.csv",
            "job.feature_logs.gex.csv",
        ):
            assert os.path.exists(os.path.join(outdir, f)), f

        cfg = json.load(open(os.path.join(outdir, "job.final_model_config.json")))
        assert cfg["model_class"] == "DirectPred"

        # inference reload on the test split
        rc = main([
            "--pretrained_model", os.path.join(outdir, "job.final_model.safetensors"),
            "--artifacts", os.path.join(outdir, "job.artifacts.json"),
            "--data_path_test", os.path.join(data_path, "test"),
            "--outdir", str(tmp_path / "inf"),
            "--prefix", "inf",
            "--disable_marker_finding",
        ])
        assert rc == 0
        stats = pd.read_csv(str(tmp_path / "inf" / "inf.stats.csv"))
        assert (stats["var"] == "subtype").any()

    def test_survival_training(self, data_path, tmp_path):
        outdir = str(tmp_path / "surv")
        _write_small_space(outdir, "DirectPred")
        rc = _run(data_path, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex",
            "--surv_event_var", "OS_STATUS",
            "--surv_time_var", "OS_MONTHS",
            "--disable_marker_finding",
        ])
        assert rc == 0
        stats = pd.read_csv(os.path.join(outdir, "job.stats.csv"))
        assert (stats["metric"] == "cindex").any()

    def test_early_fusion_and_covariates(self, data_path, tmp_path):
        outdir = str(tmp_path / "fusion")
        _write_small_space(outdir, "DirectPred")
        rc = _run(data_path, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex,cnv",
            "--target_variables", "subtype",
            "--fusion_type", "early",
            "--covariates", "age",
            "--disable_marker_finding",
            "--safetensors",
        ])
        assert rc == 0
        # training concatenates the covariate block into 'all'
        # (importer.py order + extras); config layers reflect the fusion
        cfg = json.load(open(os.path.join(outdir, "job.final_model_config.json")))
        assert "all" in cfg["layers"]

        # inference reload: the covariate block must be REBUILT from the
        # test clin.csv and re-concatenated (regression: the early-fusion
        # path previously skipped the covariates rebuild entirely,
        # producing a too-narrow input matrix)
        rc = main([
            "--pretrained_model", os.path.join(outdir, "job.final_model.safetensors"),
            "--artifacts", os.path.join(outdir, "job.artifacts.json"),
            "--data_path_test", os.path.join(data_path, "test"),
            "--outdir", str(tmp_path / "fusion_inf"),
            "--prefix", "inf",
            "--disable_marker_finding",
        ])
        assert rc == 0
        preds = pd.read_csv(
            os.path.join(str(tmp_path / "fusion_inf"), "inf.predicted_labels.csv")
        )
        assert len(preds) > 0

    def test_crossmodal(self, data_path, tmp_path):
        outdir = str(tmp_path / "xm")
        _write_small_space(outdir, "CrossModalPred")
        rc = _run(data_path, outdir, [
            "--model_class", "CrossModalPred",
            "--data_types", "gex,cnv",
            "--target_variables", "subtype",
            "--input_layers", "gex",
            "--output_layers", "cnv",
            "--disable_marker_finding",
        ])
        assert rc == 0
        assert os.path.exists(os.path.join(outdir, "job.cnv_decoded.csv"))

        # inference reload: translation model must decode on the new cohort
        rc = main([
            "--pretrained_model", os.path.join(outdir, "job.final_model.safetensors"),
            "--artifacts", os.path.join(outdir, "job.artifacts.joblib"),
            "--data_path_test", os.path.join(data_path, "test"),
            "--outdir", str(tmp_path / "xm_inf"),
            "--prefix", "inf",
            "--disable_marker_finding",
        ])
        assert rc == 0
        decoded = os.path.join(str(tmp_path / "xm_inf"), "inf.cnv_decoded.csv")
        assert os.path.exists(decoded)
        assert len(pd.read_csv(decoded, index_col=0)) == 40  # test cohort

    def test_triplet(self, data_path, tmp_path):
        outdir = str(tmp_path / "trip")
        _write_small_space(outdir, "MultiTripletNetwork")
        rc = _run(data_path, outdir, [
            "--model_class", "MultiTripletNetwork",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--disable_marker_finding",
        ])
        assert rc == 0

        # inference reload round trip
        rc = main([
            "--pretrained_model", os.path.join(outdir, "job.final_model.safetensors"),
            "--artifacts", os.path.join(outdir, "job.artifacts.joblib"),
            "--data_path_test", os.path.join(data_path, "test"),
            "--outdir", str(tmp_path / "trip_inf"),
            "--prefix", "inf",
            "--disable_marker_finding",
        ])
        assert rc == 0
        stats = pd.read_csv(str(tmp_path / "trip_inf" / "inf.stats.csv"))
        assert (stats["var"] == "subtype").any()

    def test_gnn_with_user_graph(self, data_path, tmp_path):
        outdir = str(tmp_path / "gnn")
        _write_small_space(outdir, "GNN", gnn=True)
        # build a user graph over the synthetic feature names
        rng = np.random.default_rng(0)
        genes = [f"gex_f{i}" for i in range(200)]
        graph = pd.DataFrame({
            "GeneA": rng.choice(genes, 400),
            "GeneB": rng.choice(genes, 400),
            "Score": rng.random(400),
        })
        gpath = str(tmp_path / "graph.csv")
        graph.to_csv(gpath, index=False)
        rc = _run(data_path, outdir, [
            "--model_class", "GNN",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--gnn_conv_type", "GC",
            "--user_graph", gpath,
            "--disable_marker_finding",
            "--safetensors",
        ])
        assert rc == 0
        # inference reload: graph travels inside the saved weights
        rc = main([
            "--pretrained_model", os.path.join(outdir, "job.final_model.safetensors"),
            "--artifacts", os.path.join(outdir, "job.artifacts.json"),
            "--data_path_test", os.path.join(data_path, "test"),
            "--outdir", os.path.join(outdir, "inf"),
            "--prefix", "inf",
            "--disable_marker_finding",
        ])
        assert rc == 0
        stats = pd.read_csv(os.path.join(outdir, "inf", "inf.stats.csv"))
        assert (stats["var"] == "subtype").any()

    def test_classical_model_class(self, data_path, tmp_path):
        outdir = str(tmp_path / "rf")
        os.makedirs(outdir, exist_ok=True)
        rc = main([
            "--data_path", data_path,
            "--model_class", "RandomForest",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--outdir", outdir,
            "--prefix", "job",
            "--features_top_percentile", "20",
            "--features_min", "10",
            "--subsample", "50",
            "--threads", "4",
        ])
        assert rc == 0
        stats = pd.read_csv(os.path.join(outdir, "job.stats.csv"))
        assert (stats["method"] == "RandomForestClassifier").any()

    def test_finetuning(self, data_path, tmp_path):
        outdir = str(tmp_path / "ft")
        _write_small_space(outdir, "DirectPred")
        rc = _run(data_path, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--finetuning_samples", "20",
            "--disable_marker_finding",
        ])
        assert rc == 0


class TestMoreCLIPaths:
    def test_rsf_model_class(self, data_path, tmp_path):
        outdir = str(tmp_path / "rsf")
        os.makedirs(outdir, exist_ok=True)
        rc = main([
            "--data_path", data_path,
            "--model_class", "RandomSurvivalForest",
            "--data_types", "gex",
            "--surv_event_var", "OS_STATUS",
            "--surv_time_var", "OS_MONTHS",
            "--outdir", outdir, "--prefix", "job",
            "--features_top_percentile", "50", "--features_min", "20",
            "--threads", "2",
        ])
        assert rc == 0
        stats = pd.read_csv(os.path.join(outdir, "job.stats.csv"))
        assert (stats["method"] == "RandomSurvivalForest").any()
        assert (stats["metric"] == "cindex").any()

    def test_live_loss_plot_path(self, data_path, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.models.direct_pred import DirectPred
        from flexynesis_tpu.train.hpo import HyperparameterTuning

        imp = DataImporter(data_path, ["gex"], top_percentile=50, min_features=20)
        train_ds, _ = imp.import_data()
        tuner = HyperparameterTuning(
            train_ds, DirectPred, "DirectPred",
            target_variables=["subtype"], n_iter=1, plot_losses=True,
        )
        for d in tuner.space.dimensions:
            if d.name == "epochs":
                d.categories = [5]
        model, _ = tuner.perform_tuning()
        assert model is not None

    def test_supervised_vae_multi_target(self, data_path, tmp_path):
        """Mirrors models-template.yml:77-81 (VAE, two target variables)."""
        outdir = str(tmp_path / "vae")
        _write_small_space(outdir, "supervised_vae")
        rc = _run(data_path, outdir, [
            "--model_class", "supervised_vae",
            "--data_types", "gex",
            "--target_variables", "subtype,age",
            "--disable_marker_finding",
            "--safetensors",
        ])
        assert rc == 0
        stats = pd.read_csv(os.path.join(outdir, "job.stats.csv"))
        assert set(stats["var"]) == {"subtype", "age"}
        # reload in inference mode
        rc = main([
            "--pretrained_model", os.path.join(outdir, "job.final_model.safetensors"),
            "--artifacts", os.path.join(outdir, "job.artifacts.json"),
            "--data_path_test", os.path.join(data_path, "test"),
            "--outdir", os.path.join(outdir, "inf"), "--prefix", "inf",
            "--disable_marker_finding",
        ])
        assert rc == 0

    def test_h5_autodetect_cli(self, data_path, tmp_path):
        """Mirrors the reference CI HDF5 case (models-template.yml:102-105)."""
        import shutil

        from flexynesis_tpu.csv_to_h5 import convert_csv_to_h5

        d2 = str(tmp_path / "h5data")
        shutil.copytree(data_path, d2)
        for split in ("train", "test"):
            convert_csv_to_h5(
                os.path.join(d2, split, "gex.csv"),
                os.path.join(d2, split, "gex.h5"),
            )
            os.remove(os.path.join(d2, split, "gex.csv"))
        outdir = str(tmp_path / "h5out")
        _write_small_space(outdir, "DirectPred")
        rc = _run(d2, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--disable_marker_finding",
        ])
        assert rc == 0

    def test_restrict_and_subsample(self, data_path, tmp_path):
        outdir = str(tmp_path / "rs")
        _write_small_space(outdir, "DirectPred")
        feats = tmp_path / "features.txt"
        feats.write_text("\n".join(f"gex_f{i}" for i in range(120)))
        rc = _run(data_path, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--restrict_to_features", str(feats),
            "--subsample", "50",
            "--disable_marker_finding",
        ])
        assert rc == 0
        emb = pd.read_csv(os.path.join(outdir, "job.embeddings_train.csv"),
                          index_col=0)
        assert len(emb) == 50  # subsampled training cohort

    def test_log_transform_flag(self, tmp_path):
        import numpy as np

        from flexynesis_tpu.utils.synthetic import make_synthetic_frames

        # log1p needs non-negative matrices (count-like data)
        frames = make_synthetic_frames(n_train=60, n_test=30, seed=23)
        d = tmp_path / "counts"
        for split, tables in frames.items():
            os.makedirs(d / split, exist_ok=True)
            for name, df in tables.items():
                if name != "clin":
                    df = df.abs() * 10
                df.to_csv(d / split / f"{name}.csv")
        outdir = str(tmp_path / "logout")
        _write_small_space(outdir, "DirectPred")
        rc = _run(str(d), outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--log_transform", "True",
            "--disable_marker_finding",
        ])
        assert rc == 0


class TestHpoBatchDefault:
    def _args(self, hpo_batch=0, hpo_iter=100):
        import argparse

        return argparse.Namespace(hpo_batch=hpo_batch, hpo_iter=hpo_iter)

    def test_cpu_defaults_sequential(self):
        from flexynesis_tpu.__main__ import _resolve_hpo_batch

        assert _resolve_hpo_batch(self._args()) == 1  # tests run on cpu

    def test_accelerator_defaults_to_fanout(self, monkeypatch):
        import flexynesis_tpu.__main__ as m

        class FakeDev:
            platform = "tpu"

        monkeypatch.setattr("jax.devices", lambda *a: [FakeDev()])
        assert m._resolve_hpo_batch(self._args()) == 16
        assert m._resolve_hpo_batch(self._args(hpo_iter=5)) == 5

    def test_explicit_value_wins(self, monkeypatch):
        from flexynesis_tpu.__main__ import _resolve_hpo_batch

        assert _resolve_hpo_batch(self._args(hpo_batch=3)) == 3

    def test_cli_batched_rounds_use_vmapped_trials(
        self, data_path, tmp_path, capsys
    ):
        """A batched GP round must train the group concurrently (the
        ParallelTrials vmapped path), not fall back to sequential fits."""
        outdir = str(tmp_path / "out")
        _write_small_space(outdir, "DirectPred")
        rc = _run(data_path, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--hpo_iter", "4",
            "--hpo_batch", "4",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "Training 4 same-architecture trials" in out

    def test_cli_batched_cv_rounds_fuse_folds(
        self, data_path, tmp_path, capsys
    ):
        """--use_cv with a batched round trains suggestions x folds as one
        vmapped program (VERDICT r2 #3) through the CLI surface."""
        outdir = str(tmp_path / "outcv")
        _write_small_space(outdir, "DirectPred")
        rc = _run(data_path, outdir, [
            "--model_class", "DirectPred",
            "--data_types", "gex",
            "--target_variables", "subtype",
            "--hpo_iter", "3",
            "--hpo_batch", "3",
            "--use_cv",
        ])
        assert rc == 0
        out = capsys.readouterr().out
        assert "3 suggestions x 5 CV folds = 15 trials concurrently" in out

    def test_cli_kitchen_sink_with_checkpoint_resume(
        self, data_path, tmp_path, capsys
    ):
        """The maximal flag interaction — fused CV x batched ask x
        pipelined session x early fusion x covariates x checkpoint — runs
        end-to-end, and a rerun with a larger budget RESUMES instead of
        restarting."""
        outdir = str(tmp_path / "sink")
        _write_small_space(outdir, "DirectPred")
        args = [
            "--model_class", "DirectPred",
            "--data_types", "gex,cnv",
            "--target_variables", "subtype",
            "--covariates", "age",
            "--fusion_type", "early",
            "--use_cv",
            "--hpo_iter", "2",
            "--hpo_batch", "2",
            "--hpo_pipeline", "True",
            "--hpo_checkpoint", os.path.join(outdir, "hpo.json"),
            "--disable_marker_finding",
        ]
        assert _run(data_path, outdir, args) == 0
        capsys.readouterr()
        args[args.index("--hpo_iter") + 1] = "4"  # raise the budget
        assert _run(data_path, outdir, args) == 0
        out = capsys.readouterr().out
        assert "Resuming HPO from iteration 2" in out


class TestCLIValidation:
    def _expect_error(self, args):
        with pytest.raises(SystemExit):
            main(args)

    def test_missing_training_args(self):
        self._expect_error(["--model_class", "DirectPred"])

    def test_surv_vars_must_pair(self, data_path):
        self._expect_error([
            "--data_path", data_path, "--model_class", "DirectPred",
            "--data_types", "gex", "--target_variables", "subtype",
            "--surv_event_var", "OS_STATUS",
        ])

    def test_targets_required_for_deep_models(self, data_path):
        self._expect_error([
            "--data_path", data_path, "--model_class", "DirectPred",
            "--data_types", "gex",
        ])

    def test_early_fusion_rejected_for_crossmodal(self, data_path):
        self._expect_error([
            "--data_path", data_path, "--model_class", "CrossModalPred",
            "--data_types", "gex,cnv", "--target_variables", "subtype",
            "--fusion_type", "early",
        ])

    def test_covariates_rejected_for_gnn(self, data_path):
        self._expect_error([
            "--data_path", data_path, "--model_class", "GNN",
            "--data_types", "gex", "--target_variables", "subtype",
            "--covariates", "age",
        ])
