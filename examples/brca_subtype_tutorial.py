"""Tutorial: multi-omics subtype classification + survival with the Python API.

Mirrors the reference's modeling notebooks (brca_subtypes / survival) but is
self-contained: it generates a structured synthetic cohort, so it runs
anywhere without downloads.

    python examples/brca_subtype_tutorial.py
"""

import os
import sys
import tempfile

import numpy as np

# allow running straight from a source checkout
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flexynesis_tpu as fx  # noqa: E402
from flexynesis_tpu.utils.synthetic import write_synthetic_folder


def main():
    # FX_TUTORIAL_FAST=1 shrinks the run for CI smoke tests
    fast = bool(os.environ.get("FX_TUTORIAL_FAST"))
    n_train, n_test, epochs = (80, 40, 5) if fast else (200, 100, 30)
    workdir = tempfile.mkdtemp(prefix="fx_tutorial_")
    data_dir = os.path.join(workdir, "data")
    print(f"[1/6] Generating a synthetic 2-omic cohort under {data_dir}")
    write_synthetic_folder(data_dir, n_train=n_train, n_test=n_test, seed=0)

    print("[2/6] Importing + preprocessing (cleanup, Laplacian selection, scaling)")
    importer = fx.DataImporter(
        data_dir, ["gex", "cnv"], top_percentile=50, min_features=20
    )
    train_ds, test_ds = importer.import_data()

    print("[3/6] Hyperparameter tuning (GP-BO, 3 iterations)")
    tuner = fx.HyperparameterTuning(
        train_ds,
        fx.DirectPred,
        "DirectPred",
        target_variables=["subtype"],
        surv_event_var="OS_STATUS",
        surv_time_var="OS_MONTHS",
        n_iter=1 if fast else 3,
        early_stop_patience=5,
    )
    for d in tuner.space.dimensions:  # keep the tutorial fast
        if d.name == "epochs":
            d.categories = [epochs]
    model, best = tuner.perform_tuning()
    print("    best hyperparameters:", best)

    print("[4/6] Evaluation")
    preds = model.predict(test_ds)
    stats = fx.evaluate_wrapper(
        "DirectPred", preds, test_ds,
        surv_event_var="OS_STATUS", surv_time_var="OS_MONTHS",
    )
    print(stats.to_string(index=False))

    print("[5/6] Marker discovery (IntegratedGradients)")
    imp = model.compute_feature_importance(test_ds, "subtype", steps_or_samples=25)
    top = (
        imp.sort_values("importance", ascending=False)
        .groupby("target_class")
        .head(3)[["target_class_label", "layer", "name", "importance"]]
    )
    print(top.to_string(index=False))

    print("[6/6] Survival risk stratification from the model's risk scores")
    from flexynesis_tpu.utils.survival import recursive_binary_split_minN

    import pandas as pd

    df = pd.DataFrame(
        {
            "pred_risk": np.asarray(preds["OS_STATUS"]).ravel(),
            "OS.time": np.asarray(test_ds.ann["OS_MONTHS"]),
            "OS": np.asarray(test_ds.ann["OS_STATUS"]),
        },
        index=test_ds.samples,
    ).dropna()
    groups = recursive_binary_split_minN(
        df, score="pred_risk", time="OS.time", event="OS",
        min_samples_per_group=25,
    )
    print(groups["auto_group"].value_counts().to_string())
    print(f"\nDone. Artifacts in {workdir}")


if __name__ == "__main__":
    main()
