"""Tutorial: cross-modality translation with CrossModalPred.

Train a model that encodes gene expression and reconstructs copy-number
values (gex -> cnv) while also predicting the subtype — the modeling half
of the reference's cross-modal examples, on synthetic data (no
downloads). Shows `decode()` and how reconstruction quality is assessed.

    python examples/crossmodal_translation_tutorial.py
"""

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flexynesis_tpu as fx  # noqa: E402
from flexynesis_tpu.utils.synthetic import write_synthetic_folder  # noqa: E402


def main():
    # FX_TUTORIAL_FAST=1 shrinks the run for CI smoke tests
    fast = bool(os.environ.get("FX_TUTORIAL_FAST"))
    n_train, n_test, epochs = (80, 40, 5) if fast else (200, 100, 30)
    workdir = tempfile.mkdtemp(prefix="fx_xmodal_tutorial_")
    data_dir = os.path.join(workdir, "data")
    print(f"[1/5] Generating a synthetic 2-omic cohort under {data_dir}")
    write_synthetic_folder(data_dir, n_train=n_train, n_test=n_test, seed=11)

    print("[2/5] Import + preprocessing")
    importer = fx.DataImporter(
        data_dir, ["gex", "cnv"], top_percentile=50, min_features=20
    )
    train_ds, test_ds = importer.import_data()

    print("[3/5] Train CrossModalPred: encode gex, reconstruct cnv")
    tuner = fx.HyperparameterTuning(
        train_ds,
        fx.CrossModalPred,
        "CrossModalPred",
        target_variables=["subtype"],
        input_layers=["gex"],
        output_layers=["cnv"],
        n_iter=1 if fast else 3,
        early_stop_patience=5,
    )
    for d in tuner.space.dimensions:  # keep the tutorial fast
        if d.name == "epochs":
            d.categories = [epochs]
    model, best = tuner.perform_tuning()
    print("    best hyperparameters:", best)

    print("[4/5] Subtype prediction quality on the test cohort")
    preds = model.predict(test_ds)
    stats = fx.evaluate_wrapper("CrossModalPred", preds, test_ds)
    print(stats.to_string(index=False))

    print("[5/5] Translation: decode cnv from gex, per-feature correlation")
    decoded = model.decode(test_ds)["cnv"]
    truth = np.asarray(test_ds.dat["cnv"])
    recon = decoded.to_numpy()
    # correlation between true and reconstructed values, per feature
    tz = (truth - truth.mean(0)) / (truth.std(0) + 1e-9)
    rz = (recon - recon.mean(0)) / (recon.std(0) + 1e-9)
    corr = (tz * rz).mean(0)
    print(f"    reconstructed matrix: {decoded.shape}")
    print(f"    mean per-feature correlation: {np.nanmean(corr):.3f}  "
          f"(top feature {np.nanmax(corr):.3f})")
    print(f"\nDone. Artifacts in {workdir}")


if __name__ == "__main__":
    main()
