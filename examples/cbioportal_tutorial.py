"""Tutorial: fetching and modeling a cBioPortal study.

Mirrors the reference's cbioportal notebook (reference
examples/tutorials/cbioportal.ipynb, executed in its CI via
tutorials-template.yml): fetch a study archive from the cBioPortal datahub,
binarize the long mutations table into a gene x sample 0/1 matrix, write a
train/test split in the framework's folder layout, import it, and train a
DirectPred subtype classifier with marker discovery.

Fully offline by default: a realistic datahub-format study archive
(clinical table with '#' metadata headers + long mutations table, packed
as <study_id>.tar.gz) is generated locally and pre-placed in the cache, so
``CBioPortalData``'s exact download/extract/read code path runs without
network. Set FX_CBIO_STUDY to a real study id (e.g. ``lgg_ucsf_2014``) on
a networked machine to fetch the real archive through the same path.

    python examples/cbioportal_tutorial.py
"""

import os
import sys
import tarfile
import tempfile

import numpy as np
import pandas as pd

# allow running straight from a source checkout
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import flexynesis_tpu as fx  # noqa: E402
from flexynesis_tpu.utils.cbioportal import CBioPortalData  # noqa: E402

SUBTYPES = ("Luminal", "Basal", "Her2")


def write_demo_study_archive(cache_dir: str, study_id: str, n_patients: int,
                             n_genes: int = 120, seed: int = 0) -> str:
    """Build a datahub-format study tarball: data_clinical_patient.txt with
    '#' metadata headers + a long data_mutations.txt, like the archives at
    https://datahub.assets.cbioportal.org (reference utils.py:1967-2118)."""
    rng = np.random.default_rng(seed)
    patients = [f"P{i:04d}" for i in range(n_patients)]
    subtype = rng.integers(0, len(SUBTYPES), n_patients)
    genes = [f"GENE{j:03d}" for j in range(n_genes)]
    # each subtype gets 12 driver genes mutated far above background
    drivers = {
        s: rng.choice(n_genes, 12, replace=False) for s in range(len(SUBTYPES))
    }

    study_dir = os.path.join(cache_dir, study_id)
    os.makedirs(study_dir, exist_ok=True)

    clin_path = os.path.join(study_dir, "data_clinical_patient.txt")
    with open(clin_path, "w") as fh:
        fh.write("#Patient Identifier\tSubtype\tDiagnosis Age\n")
        fh.write("#Identifier of a patient\tTumor subtype\tAge\n")
        fh.write("#STRING\tSTRING\tNUMBER\n")
        fh.write("#1\t1\t1\n")
        fh.write("PATIENT_ID\tSUBTYPE\tAGE\n")
        for p, s in zip(patients, subtype):
            age = int(rng.normal(58, 10))
            fh.write(f"{p}\t{SUBTYPES[s]}\t{age}\n")

    rows = []
    for p, s in zip(patients, subtype):
        prob = np.full(n_genes, 0.04)
        prob[drivers[int(s)]] = 0.55
        mutated = np.flatnonzero(rng.random(n_genes) < prob)
        if mutated.size == 0:  # every sample appears in the long table
            mutated = np.array([int(drivers[int(s)][0])])
        for g in mutated:
            rows.append((genes[g], p, "Missense_Mutation"))
    mut = pd.DataFrame(
        rows, columns=["Hugo_Symbol", "Tumor_Sample_Barcode",
                       "Variant_Classification"]
    )
    mut.to_csv(os.path.join(study_dir, "data_mutations.txt"),
               sep="\t", index=False)

    archive = os.path.join(cache_dir, f"{study_id}.tar.gz")
    with tarfile.open(archive, "w:gz") as tar:
        tar.add(study_dir, arcname=study_id)
    return archive


def main():
    fast = bool(os.environ.get("FX_TUTORIAL_FAST"))
    n_patients, epochs, hpo_iter = (90, 5, 1) if fast else (240, 30, 3)
    workdir = tempfile.mkdtemp(prefix="fx_cbioportal_")
    cache = os.path.join(workdir, "cache")
    os.makedirs(cache, exist_ok=True)

    study_id = os.environ.get("FX_CBIO_STUDY", "demo_study")
    print(f"[1/6] Preparing study '{study_id}' (cache: {cache})")
    if study_id == "demo_study":
        # offline: pre-place the archive where download_study_archive
        # caches it, so the download short-circuits on the existing file
        write_demo_study_archive(cache, study_id, n_patients)

    portal = CBioPortalData(study_id, cache_dir=cache)
    print("[2/6] Fetch + extract + read (mutations binarized to gene x sample)")
    dat = portal.get_cbioportal_data(study_id)
    print(f"    clinical: {dat['clin'].shape}, "
          f"binarized mutations: {dat['mut'].shape}")

    print("[3/6] 70/30 train/test split -> framework folder layout")
    split = portal.split_data(ratio=0.7)
    data_dir = os.path.join(workdir, "dataset")
    portal.print_dataset(split, data_dir)

    print("[4/6] Import (binary features: no variance filter, keep all)")
    importer = fx.DataImporter(
        data_dir, ["mut"], top_percentile=50, variance_threshold=0,
        na_threshold=1.0, min_features=20,
    )
    train_ds, test_ds = importer.import_data()

    print(f"[5/6] Hyperparameter tuning (GP-BO, {hpo_iter} iteration(s))")
    tuner = fx.HyperparameterTuning(
        train_ds, fx.DirectPred, "DirectPred",
        target_variables=["SUBTYPE"], n_iter=hpo_iter, early_stop_patience=5,
    )
    for d in tuner.space.dimensions:  # keep the tutorial fast
        if d.name == "epochs":
            d.categories = [epochs]
    model, best = tuner.perform_tuning()
    print("    best hyperparameters:", best)

    print("[6/6] Evaluation + mutation marker discovery")
    preds = model.predict(test_ds)
    stats = fx.evaluate_wrapper("DirectPred", preds, test_ds)
    print(stats.to_string(index=False))
    imp = model.compute_feature_importance(
        test_ds, "SUBTYPE", steps_or_samples=25
    )
    top = (
        imp.sort_values("importance", ascending=False)
        .groupby("target_class")
        .head(3)[["target_class_label", "layer", "name", "importance"]]
    )
    print(top.to_string(index=False))
    print(f"\nDone. Artifacts in {workdir}")


if __name__ == "__main__":
    main()
