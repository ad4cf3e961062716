"""flexynesis-tpu command-line interface.

Capability parity with /root/reference/flexynesis/__main__.py: the same flag
surface (training + inference modes, model classes incl. classical ML,
fusion, survival, covariates, GNN graph sources, feature selection knobs,
fine-tuning, marker discovery, safetensors artifacts), the same output file
suite (stats.csv, predicted_labels.csv, embeddings_{train,test}.csv,
feature_importance.<method>.csv, feature_logs.<layer>.csv,
baseline.stats.csv, <prefix>.final_model.* + config + artifacts).

TPU notes: --device gains 'tpu' (auto prefers TPU when present); model
weights save as safetensors pytrees (there is no torch pickle format here —
--safetensors therefore only switches the ARTIFACTS between joblib and JSON,
weights are always safetensors).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

__version__ = "0.1.0"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="flexynesis-tpu model training interface",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
    )
    p.add_argument("-v", "--version", action="version",
                   version=f"%(prog)s {__version__}")
    p.add_argument("--data_path", type=str,
                   help="Folder with train/test data files")
    p.add_argument(
        "--model_class", type=str,
        choices=["DirectPred", "supervised_vae", "MultiTripletNetwork",
                 "CrossModalPred", "GNN", "RandomForest", "SVM", "XGBoost",
                 "RandomSurvivalForest"],
        help="Model class to instantiate",
    )
    p.add_argument("--gnn_conv_type", type=str,
                   choices=["GC", "GCN", "SAGE", "GAT"],
                   help="Graph convolution type for GNN (GAT is a TPU-build "
                        "extension; the reference CLI stops at SAGE)")
    p.add_argument("--target_variables", type=str, default=None,
                   help="clin.csv variables to predict (comma-separated)")
    p.add_argument("--covariates", type=str, default=None,
                   help="clin.csv variables used as feature covariates")
    p.add_argument("--surv_event_var", type=str, default=None,
                   help="clin.csv column with event/status indicator")
    p.add_argument("--surv_time_var", type=str, default=None,
                   help="clin.csv column with time/duration")
    p.add_argument("--config_path", type=str, default=None,
                   help="YAML hyperparameter search-space override")
    p.add_argument("--fusion_type", type=str, choices=["early", "intermediate"],
                   default="intermediate", help="How to fuse the omics layers")
    p.add_argument("--hpo_iter", type=int, default=100,
                   help="Hyperparameter optimisation iterations")
    p.add_argument("--hpo_batch", type=int, default=0,
                   help="HPO suggestions evaluated per GP round (TPU trial "
                        "fan-out). Default 0 = auto: min(16, hpo_iter) on an "
                        "accelerator, 1 (sequential, reference-like) on CPU")
    p.add_argument("--hpo_pipeline", type=str, default="True",
                   choices=["True", "False"],
                   help="Pipeline the GP ask: compute round N+1's "
                        "suggestions on the host while round N trains on "
                        "device (batched rounds only)")
    p.add_argument("--finetuning_samples", type=int, default=0,
                   help="Test samples used for fine-tuning (0 disables)")
    p.add_argument("--variance_threshold", type=float, default=1,
                   help="Variance percentile to drop low-variance features")
    p.add_argument("--correlation_threshold", type=float, default=0.8,
                   help="Correlation threshold for redundancy filtering")
    p.add_argument("--restrict_to_features", type=str, default=None,
                   help="File with feature list to restrict the analysis to")
    p.add_argument("--subsample", type=int, default=0,
                   help="Downsample training set to N random samples")
    p.add_argument("--features_min", type=int, default=500,
                   help="Minimum features to retain after selection")
    p.add_argument("--features_top_percentile", type=float, default=20,
                   help="Top percentile of features to retain")
    p.add_argument("--data_types", type=str,
                   help="Omic matrices to use, e.g. 'gex,cnv'")
    p.add_argument("--input_layers", type=str, default=None,
                   help="CrossModalPred input/encoded layers")
    p.add_argument("--output_layers", type=str, default=None,
                   help="CrossModalPred output/decoded layers")
    p.add_argument("--outdir", type=str, default=os.getcwd(),
                   help="Output folder")
    p.add_argument("--prefix", type=str, default="job", help="Output prefix")
    p.add_argument("--log_transform", type=str, choices=["True", "False"],
                   default="False", help="log1p-transform input matrices")
    p.add_argument("--early_stop_patience", type=int, default=10,
                   help="Epoch patience for val-loss early stopping (-1 off)")
    p.add_argument("--hpo_patience", type=int, default=20,
                   help="HPO iterations without improvement before stopping")
    p.add_argument("--val_size", type=float, default=0.2,
                   help="Validation split fraction")
    p.add_argument("--use_cv", action="store_true",
                   help="5-fold cross-validated HPO objective")
    p.add_argument("--use_loss_weighting", type=str, choices=["True", "False"],
                   default="True", help="Uncertainty-weighted loss balancing")
    p.add_argument("--evaluate_baseline_performance", action="store_true",
                   help="Also run classical-ML baselines")
    p.add_argument("--threads", type=int, default=4, help="Host CPU threads")
    p.add_argument("--num_workers", type=int, default=0,
                   help="(compat) host workers; unused — data is device-resident")
    p.add_argument("--use_gpu", action="store_true",
                   help="DEPRECATED: use --device")
    p.add_argument("--device", type=str,
                   choices=["auto", "tpu", "cuda", "mps", "cpu"], default="auto",
                   help="Accelerator selection")
    p.add_argument("--feature_importance_method", type=str,
                   choices=["IntegratedGradients", "GradientShap", "Both"],
                   default="IntegratedGradients")
    p.add_argument("--disable_marker_finding", action="store_true")
    p.add_argument("--marker_sample_cap", type=int, default=0,
                   help="Subsample the attribution cohort to this many "
                        "samples (the reference always caps at 10000; here "
                        "the default 0 = no cap — large cohorts shard the "
                        "sample axis over all devices instead)")
    p.add_argument("--string_organism", type=int, default=9606,
                   help="STRING DB organism id")
    p.add_argument("--string_node_name", type=str,
                   choices=["gene_name", "gene_id"], default="gene_name")
    p.add_argument("--user_graph", type=str, default=None,
                   help="Custom GeneA/GeneB/Score network file")
    p.add_argument("--safetensors", action="store_true",
                   help="JSON artifacts instead of joblib (weights are always "
                        "safetensors)")
    p.add_argument("--pretrained_model", type=str, default=None,
                   help="Saved model for inference mode")
    p.add_argument("--artifacts", type=str, default=None,
                   help="Artifacts .joblib/.json from training")
    p.add_argument("--data_path_test", type=str, default=None,
                   help="Test-only dataset folder for inference")
    p.add_argument("--join_key", type=str, default="JoinKey",
                   help="clin.csv column used to join sample IDs")
    p.add_argument("--hpo_checkpoint", type=str, default=None,
                   help="Path for preemption-safe HPO state checkpointing")
    p.add_argument("--profile", action="store_true",
                   help="Per-phase wall/memory profiling + JAX device trace "
                        "written under <outdir>/<prefix>.profile/")
    return p


def _split(s):
    return [x.strip() for x in s.split(",")] if s else None


def _select_device(args) -> None:
    """Pin the JAX platform per --device (reference utils.py:2198-2238).

    The platform must be set BEFORE anything initializes the JAX backend:
    jax.config.update("jax_platforms", ...) is a silent no-op once a backend
    is live (and merely probing jax.devices() initializes one — under the
    single-chip TPU tunnel that also grabs the chip grant). If a backend is
    already initialized on the wrong platform we restart it.
    """
    import jax
    from jax._src import xla_bridge

    want = args.device
    if want == "cpu":
        if not xla_bridge.backends_are_initialized():
            jax.config.update("jax_platforms", "cpu")
        elif jax.devices()[0].platform != "cpu":
            import jax.extend

            print("[WARN] JAX backend already initialized on "
                  f"{jax.devices()[0].platform}; restarting on cpu")
            jax.extend.backend.clear_backends()
            jax.config.update("jax_platforms", "cpu")
    plats = {d.platform for d in jax.devices()}
    if want == "cpu" and plats != {"cpu"}:
        raise RuntimeError(
            f"--device cpu requested but JAX platforms are {plats}"
        )
    print(f"[INFO] JAX devices: {jax.devices()}")
    print(f"[INFO] Using device preference: {want} (platforms: {plats})")


def _resolve_hpo_batch(args) -> int:
    """``--hpo_batch 0`` (the default) picks the TPU-first fan-out: batched
    GP asks of min(16, hpo_iter) trials train concurrently (vmapped) on an
    accelerator, while CPU runs stay sequential like the reference so the
    reference-style invocation is fast on either backend."""
    if args.hpo_batch and args.hpo_batch > 0:
        return args.hpo_batch
    import jax

    on_accel = jax.devices()[0].platform != "cpu"
    batch = min(16, args.hpo_iter) if on_accel else 1
    if batch > 1:
        print(f"[INFO] HPO trial fan-out: {batch} suggestions per GP round "
              "(vmapped; --hpo_batch 1 restores sequential trials)")
    return batch


# --------------------------------------------------------------- inference


def run_inference(args) -> int:
    import numpy as np

    from .data.inference_importer import DataImporterInference
    from .inference import (
        check_model_type,
        load_and_sniff_artifacts,
        reconstruct_model,
    )
    from .utils.metrics import evaluate_wrapper, get_predicted_labels

    kind = check_model_type(args.pretrained_model)
    if kind != "safetensors":
        raise ValueError(
            "flexynesis-tpu models are safetensors parameter pytrees; "
            f"got a '{kind}' file. Torch .pth files belong to the PyTorch "
            "reference implementation."
        )
    config_path = args.pretrained_model.replace(
        ".final_model.safetensors", ".final_model_config.json"
    )
    if not os.path.exists(config_path):
        raise FileNotFoundError(
            f"Expected model config JSON next to the weights: {config_path}"
        )
    artifacts = load_and_sniff_artifacts(args.artifacts)
    model = reconstruct_model(args.pretrained_model, config_path, artifacts)
    print(f"[INFO] Reconstructed {model.model_name} from {args.pretrained_model}")

    importer = DataImporterInference(args.data_path_test, artifacts)
    test_dataset = importer.import_data()

    if model.model_name == "GNN":
        # rebuild the node tensor over the training node set using the
        # interaction graph embedded in the saved weights
        import pandas as pd

        from .data.dataset import MultiOmicDatasetNW

        node_names = list(model.nw_dataset.node_names)
        src, dst = np.asarray(model.nw_dataset.edge_index)
        edges_df = pd.DataFrame(
            {
                "protein1": [node_names[i] for i in src],
                "protein2": [node_names[i] for i in dst],
            }
        )
        test_dataset = MultiOmicDatasetNW(
            test_dataset, edges_df, node_names=node_names
        )

    _write_eval_outputs(args, model, None, test_dataset)

    if args.finetuning_samples > 0:
        _finetune(args, model, test_dataset)
        _save_model_files(args, model, None)
    return 0


# ---------------------------------------------------------------- training


def _build_importer(args):
    from .data.h5 import H5DataImporter, folder_has_h5
    from .data.importer import DataImporter

    data_types = _split(args.data_types)
    kwargs = dict(
        path=args.data_path,
        data_types=data_types,
        covariates=_split(args.covariates),
        log_transform=args.log_transform == "True",
        concatenate=args.fusion_type == "early",
        restrict_to_features=args.restrict_to_features,
        min_features=args.features_min,
        top_percentile=args.features_top_percentile,
        correlation_threshold=args.correlation_threshold,
        variance_threshold=args.variance_threshold / 100.0
        if args.variance_threshold > 0
        else 0.0,
        downsample=args.subsample,
    )
    cls = H5DataImporter if folder_has_h5(args.data_path, data_types) else DataImporter
    return cls(**kwargs)


def _load_graph(args, dataset):
    from .data.dataset import MultiOmicDatasetNW
    from .data.graph import STRING, read_user_graph

    if args.user_graph:
        graph_df = read_user_graph(args.user_graph)
    else:
        graph_df = STRING(
            organism=args.string_organism, node_name=args.string_node_name
        ).graph_df
    nw = MultiOmicDatasetNW(dataset, graph_df)
    nw.print_stats()
    return nw


def _finetune(args, model, test_dataset):
    import numpy as np

    from .train.finetune import FineTuner

    rng = np.random.default_rng(42)
    n = len(test_dataset)
    k = min(args.finetuning_samples, n)
    idx = rng.choice(n, size=k, replace=False)
    finetune_ds = test_dataset.subset(idx)
    print(f"[INFO] Fine-tuning on {k} test samples")
    tuner = FineTuner(model, finetune_ds)
    tuner.run_experiments()


def _write_eval_outputs(args, model, train_dataset, test_dataset):
    """Embeddings, marker discovery, predictions, stats (reference
    __main__.py:1353-1469)."""
    import pandas as pd

    from .utils.metrics import evaluate_wrapper, get_predicted_labels

    outdir, prefix = args.outdir, args.prefix

    if train_dataset is not None:
        model.transform(train_dataset).to_csv(
            os.path.join(outdir, f"{prefix}.embeddings_train.csv")
        )
    emb_test = model.transform(test_dataset)
    emb_test.to_csv(os.path.join(outdir, f"{prefix}.embeddings_test.csv"))

    if not args.disable_marker_finding:
        methods = (
            ["IntegratedGradients", "GradientShap"]
            if args.feature_importance_method == "Both"
            else [args.feature_importance_method]
        )
        # the reference always caps the attribution cohort at 10k seeded
        # subsamples (__main__.py:1377-1387); here the cap is opt-in
        # (--marker_sample_cap) because large cohorts shard the sample axis
        # across all devices instead (interpret/attribution.py)
        attr_dataset = test_dataset
        cap = args.marker_sample_cap
        if cap and len(test_dataset) > cap:
            import numpy as np

            rng = np.random.default_rng(42)
            idx = rng.choice(len(test_dataset), size=cap, replace=False)
            attr_dataset = test_dataset.subset(idx)
            print(f"[INFO] Capping marker discovery at {cap} subsampled samples")
        attr_mesh = None
        if len(attr_dataset) > 2048:
            import jax

            if len(jax.devices()) > 1:
                from .parallel.mesh import get_mesh

                attr_mesh = get_mesh((("data", len(jax.devices())),))
                print(
                    f"[INFO] Sharding attribution sample axis over "
                    f"{len(jax.devices())} devices"
                )
        for method in methods:
            dfs = []
            for var in model.variables:
                print(f"[INFO] Computing feature importance ({method}) for {var}")
                dfs.append(
                    model.compute_feature_importance(
                        attr_dataset, var, method=method, steps_or_samples=25,
                        mesh=attr_mesh,
                    )
                )
            pd.concat(dfs, ignore_index=True).to_csv(
                os.path.join(outdir, f"{prefix}.feature_importance.{method}.csv"),
                index=False,
            )

    preds_test = model.predict(test_dataset)
    tables = [
        get_predicted_labels(preds_test, test_dataset, "test", model.model_name)
    ]
    if train_dataset is not None:
        preds_train = model.predict(train_dataset)
        tables.append(
            get_predicted_labels(
                preds_train, train_dataset, "train", model.model_name
            )
        )
    pd.concat(tables, ignore_index=True).to_csv(
        os.path.join(outdir, f"{prefix}.predicted_labels.csv"), index=False
    )

    stats = evaluate_wrapper(
        model.model_name,
        preds_test,
        test_dataset,
        surv_event_var=model.surv_event_var,
        surv_time_var=model.surv_time_var,
    )
    stats.to_csv(os.path.join(outdir, f"{prefix}.stats.csv"), index=False)
    print(stats.to_string(index=False))

    if model.model_name == "CrossModalPred":
        for layer, df in model.decode(test_dataset).items():
            df.to_csv(
                os.path.join(outdir, f"{prefix}.{layer}_decoded.csv")
            )


def _save_model_files(args, model, data_importer):
    from .inference import (
        build_artifacts,
        save_model,
        save_model_config,
        write_artifacts,
    )

    outdir, prefix = args.outdir, args.prefix
    weights = os.path.join(outdir, f"{prefix}.final_model.safetensors")
    save_model(model, weights)
    save_model_config(
        model, os.path.join(outdir, f"{prefix}.final_model_config.json")
    )
    print(f"[INFO] Model saved to {weights}")

    if data_importer is not None:
        try:
            artifacts = build_artifacts(
                data_importer,
                _split(args.data_types) or [],
                _split(args.target_variables) or [],
                covariates=_split(args.covariates),
                join_key=args.join_key,
                string_organism=args.string_organism,
                string_node_name=args.string_node_name,
            )
            if args.safetensors:
                path = os.path.join(outdir, f"{prefix}.artifacts.json")
                write_artifacts(artifacts, path, as_json=True)
            else:
                path = os.path.join(outdir, f"{prefix}.artifacts.joblib")
                write_artifacts(artifacts, path, as_json=False)
            print(f"[INFO] Wrote inference artifacts to {path}")
        except Exception as e:  # parity: artifact failures only warn
            print(f"[WARN] Could not write inference artifacts: {e}")


def run_classical(args, train_dataset, test_dataset) -> int:
    """RandomForest/SVM/XGBoost/RandomSurvivalForest as --model_class
    (reference __main__.py:1170-1235)."""
    import pandas as pd

    from .utils.baselines import (
        evaluate_baseline_performance,
        evaluate_baseline_survival_performance,
    )

    outdir, prefix = args.outdir, args.prefix
    if args.model_class == "RandomSurvivalForest":
        stats, preds = evaluate_baseline_survival_performance(
            train_dataset, test_dataset, args.surv_time_var, args.surv_event_var,
            n_jobs=args.threads,
        )
    else:
        frames, pred_frames = [], []
        for var in _split(args.target_variables) or []:
            s, p = evaluate_baseline_performance(
                train_dataset, test_dataset, var, [args.model_class],
                n_jobs=args.threads,
            )
            frames.append(s)
            pred_frames.append(p)
        stats = pd.concat(frames, ignore_index=True)
        preds = pd.concat(pred_frames, ignore_index=True)
    stats.to_csv(os.path.join(outdir, f"{prefix}.stats.csv"), index=False)
    preds.to_csv(
        os.path.join(outdir, f"{prefix}.predicted_labels.csv"), index=False
    )
    print(stats.to_string(index=False))
    return 0


def run_training(args) -> int:
    import pandas as pd

    from .models import MODEL_REGISTRY
    from .train.hpo import HyperparameterTuning
    from .utils.profiling import PhaseTimer, trace

    t0 = time.time()
    timer = PhaseTimer(enabled=args.profile)
    trace_dir = (
        os.path.join(args.outdir, f"{args.prefix}.profile")
        if args.profile
        else None
    )
    with timer.phase("data_import"):
        data_importer = _build_importer(args)
        train_dataset, test_dataset = data_importer.import_data()

    # feature logs (reference __main__.py:1270-1280)
    logs = data_importer.feature_logs
    if isinstance(logs, dict):
        for layer, df in logs.items():
            df.to_csv(
                os.path.join(args.outdir, f"{args.prefix}.feature_logs.{layer}.csv"),
                index=False,
            )

    if args.model_class in ("RandomForest", "SVM", "XGBoost",
                            "RandomSurvivalForest"):
        return run_classical(args, train_dataset, test_dataset)

    if args.model_class == "GNN":
        train_dataset = _load_graph(args, train_dataset)
        # test split reuses the training node set + interaction graph
        test_dataset = type(train_dataset)(
            test_dataset,
            train_dataset.interaction_df,
            node_names=train_dataset.node_names,
        )

    tuner_timer_cm = timer.phase("hpo_training")
    tuner = HyperparameterTuning(
        dataset=train_dataset,
        model_class=MODEL_REGISTRY[args.model_class],
        config_name=args.model_class,
        target_variables=_split(args.target_variables) or [],
        surv_event_var=args.surv_event_var,
        surv_time_var=args.surv_time_var,
        n_iter=args.hpo_iter,
        config_path=args.config_path,
        val_size=args.val_size,
        use_cv=args.use_cv,
        use_loss_weighting=args.use_loss_weighting == "True",
        early_stop_patience=args.early_stop_patience,
        gnn_conv_type=args.gnn_conv_type,
        input_layers=_split(args.input_layers),
        output_layers=_split(args.output_layers),
        checkpoint_path=args.hpo_checkpoint,
        batch_ask=_resolve_hpo_batch(args),
        pipeline_ask=args.hpo_pipeline == "True",
    )
    with tuner_timer_cm, trace(trace_dir):
        model, best_params = tuner.perform_tuning(hpo_patience=args.hpo_patience)
    print(f"[INFO] Best hyperparameters: {best_params}")

    if args.finetuning_samples > 0:
        with timer.phase("finetuning"):
            _finetune(args, model, test_dataset)

    with timer.phase("evaluation_outputs"):
        _write_eval_outputs(args, model, train_dataset, test_dataset)

    if args.evaluate_baseline_performance:
        _run_baseline_comparison(args, train_dataset, test_dataset)

    _save_model_files(args, model, data_importer)
    timer.report(
        os.path.join(args.outdir, f"{args.prefix}.profile.json")
        if args.profile
        else None
    )
    print(f"[INFO] Total wall time: {time.time() - t0:.1f}s")
    return 0


def _run_baseline_comparison(args, train_dataset, test_dataset):
    import pandas as pd

    from .utils.baselines import (
        evaluate_baseline_performance,
        evaluate_baseline_survival_performance,
    )

    frames, preds = [], []
    for var in _split(args.target_variables) or []:
        try:
            s, p = evaluate_baseline_performance(
                train_dataset, test_dataset, var,
                ["RandomForest", "SVM", "XGBoost"], n_jobs=args.threads,
            )
        except ValueError as e:
            # e.g. an entirely unlabeled cohort for this variable — the
            # baseline comparison is a side output; don't abort the run
            print(f"[WARN] Skipping baseline comparison for '{var}': {e}")
            continue
        frames.append(s)
        preds.append(p)
    if args.surv_event_var and args.surv_time_var:
        try:
            s, p = evaluate_baseline_survival_performance(
                train_dataset, test_dataset,
                args.surv_time_var, args.surv_event_var, n_jobs=args.threads,
            )
        except (ValueError, ZeroDivisionError) as e:
            # empty/degenerate survival columns (concordance_index raises
            # ZeroDivisionError when no pair is admissible)
            print(f"[WARN] Skipping survival baseline comparison: {e}")
        else:
            frames.append(s)
            preds.append(p)
    if frames:
        pd.concat(frames, ignore_index=True).to_csv(
            os.path.join(args.outdir, f"{args.prefix}.baseline.stats.csv"),
            index=False,
        )
        pd.concat(preds, ignore_index=True).to_csv(
            os.path.join(
                args.outdir, f"{args.prefix}.baseline.predicted_labels.csv"
            ),
            index=False,
        )


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)

    os.makedirs(args.outdir, exist_ok=True)
    os.environ.setdefault("OMP_NUM_THREADS", str(args.threads))

    in_infer = bool(args.pretrained_model)
    if not in_infer:
        missing = [
            k for k in ("data_path", "model_class", "data_types")
            if not getattr(args, k)
        ]
        if missing:
            parser.error(
                "required in training mode: "
                + ", ".join(f"--{m}" for m in missing)
            )
        deep = args.model_class in (
            "DirectPred", "supervised_vae", "MultiTripletNetwork",
            "CrossModalPred", "GNN",
        )
        if deep and not args.target_variables and not (
            args.surv_event_var and args.surv_time_var
        ):
            parser.error(
                "either --target_variables or both survival variables required"
            )
        if (args.surv_event_var is None) != (args.surv_time_var is None):
            parser.error(
                "--surv_event_var and --surv_time_var must be set together"
            )
        if args.fusion_type == "early" and args.model_class in (
            "CrossModalPred", "GNN",
        ):
            parser.error(
                f"--fusion_type early is not applicable to {args.model_class}"
            )
        if args.model_class == "GNN" and args.covariates:
            parser.error("--covariates are not supported for GNN models")

    _select_device(args)

    if in_infer:
        if not (args.artifacts and args.data_path_test):
            parser.error(
                "inference mode needs --pretrained_model, --artifacts and "
                "--data_path_test"
            )
        return run_inference(args)
    return run_training(args)


if __name__ == "__main__":
    sys.exit(main())
