"""Tutorial: survival modeling and risk stratification (LGG/GBM-style).

Mirrors the reference's survival_subtypes_LGG_GBM notebook on a
self-contained synthetic cohort: train a survival-head DirectPred, derive
risk groups, compare them with log-rank statistics and Kaplan-Meier
curves, and fit a multivariate Cox model on the top survival markers.

    python examples/survival_subtypes_tutorial.py
"""

import os
import sys
import tempfile

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flexynesis_tpu as fx  # noqa: E402
from flexynesis_tpu.utils.synthetic import write_synthetic_folder  # noqa: E402


def main():
    # FX_TUTORIAL_FAST=1 shrinks the run for CI smoke tests
    fast = bool(os.environ.get("FX_TUTORIAL_FAST"))
    n_train, n_test, epochs = (80, 40, 5) if fast else (240, 120, 30)
    workdir = tempfile.mkdtemp(prefix="fx_surv_tutorial_")
    data_dir = os.path.join(workdir, "data")
    print(f"[1/7] Generating a synthetic survival cohort under {data_dir}")
    write_synthetic_folder(data_dir, n_train=n_train, n_test=n_test, seed=7)

    print("[2/7] Import + preprocessing")
    importer = fx.DataImporter(
        data_dir, ["gex", "cnv"], top_percentile=50, min_features=20
    )
    train_ds, test_ds = importer.import_data()

    print("[3/7] Train a survival-only DirectPred (Cox partial likelihood)")
    tuner = fx.HyperparameterTuning(
        train_ds,
        fx.DirectPred,
        "DirectPred",
        target_variables=[],
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

    print("[4/7] Evaluate: Harrell's C-index on the test cohort")
    preds = model.predict(test_ds)
    stats = fx.evaluate_wrapper(
        "DirectPred", preds, test_ds,
        surv_event_var="OS_STATUS", surv_time_var="OS_MONTHS",
    )
    print(stats.to_string(index=False))

    print("[5/7] Risk stratification: optimal cutoff + log-rank")
    from flexynesis_tpu.utils.survival import (
        find_optimal_cutoff, logrank_test,
    )

    risk = np.asarray(preds["OS_STATUS"]).ravel()
    time = np.asarray(test_ds.ann["OS_MONTHS"], dtype=float)
    event = np.asarray(test_ds.ann["OS_STATUS"], dtype=float)
    keep = np.isfinite(time) & np.isfinite(event)
    risk, time, event = risk[keep], time[keep], event[keep]

    cutoff, cutoff_p = find_optimal_cutoff(risk, time, event)
    if cutoff is None:  # near-constant risk scores: fall back to the median
        cutoff, cutoff_p = float(np.median(risk)), float("nan")
    hi = risk > cutoff
    lr = logrank_test(time[hi], time[~hi], event[hi], event[~hi])
    print(f"    cutoff={cutoff:.4f} (p={cutoff_p:.3g})  "
          f"high-risk n={hi.sum()}  low-risk n={(~hi).sum()}")
    print(f"    log-rank statistic={lr.test_statistic:.2f}  p={lr.p_value:.3g}")

    print("[6/7] Kaplan-Meier curves per risk group (saved to PNG)")
    from flexynesis_tpu.utils.plotting import plot_kaplan_meier_curves

    km_df = pd.DataFrame({
        "time": time, "event": event,
        "group": np.where(hi, "high-risk", "low-risk"),
    })
    fig = plot_kaplan_meier_curves(
        km_df["time"], km_df["event"], km_df["group"]
    )
    km_path = os.path.join(workdir, "km_risk_groups.png")
    fig.savefig(km_path)
    print(f"    wrote {km_path}")

    print("[7/7] Multivariate Cox model on the top survival markers")
    from flexynesis_tpu.utils.survival import build_cox_model

    imp = model.compute_feature_importance(
        test_ds, "OS_STATUS", steps_or_samples=25
    )
    top = imp.sort_values("importance", ascending=False).head(5)
    print(top[["layer", "name", "importance"]].to_string(index=False))

    cols = {}
    for _, row in top.iterrows():
        mat = np.asarray(test_ds.dat[row["layer"]])
        j = list(test_ds.features[row["layer"]]).index(row["name"])
        cols[f"{row['layer']}:{row['name']}"] = mat[:, j]
    cox_df = pd.DataFrame(cols, index=test_ds.samples)
    cox_df["OS_MONTHS"] = np.asarray(test_ds.ann["OS_MONTHS"], dtype=float)
    cox_df["OS_STATUS"] = np.asarray(test_ds.ann["OS_STATUS"], dtype=float)
    cox_df = cox_df.dropna()

    cox, metrics = build_cox_model(cox_df, "OS_MONTHS", "OS_STATUS")
    ci = metrics["cv_cindex_mean"]
    print(f"    5-fold CV C-index: {ci:.3f}" if ci is not None
          else "    5-fold CV C-index: n/a")
    print(cox.summary.to_string())
    print(f"\nDone. Artifacts in {workdir}")


if __name__ == "__main__":
    main()
