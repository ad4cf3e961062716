"""HDF5 modality ingestion.

Capability parity with /root/reference/flexynesis/h5_dataloader.py
(H5DataImporter): modality matrices load from ``{dt}.h5`` (layout
``/matrix`` (n_samples, n_features) float32, ``/sample_ids``,
``/feature_names`` byte strings — as written by csv_to_h5) with a CSV
fallback per modality; ``clin.csv`` is always CSV.
"""

from __future__ import annotations

import os

import h5py
import numpy as np
import pandas as pd

from .importer import DataImporter


class H5DataImporter(DataImporter):
    """DataImporter that prefers .h5 modality files over .csv."""

    def read_data(self, folder_path: str):
        data = {}
        for name in ["clin"] + self.data_types:
            if name in self.data_types:
                h5_path = os.path.join(folder_path, f"{name}.h5")
                if os.path.exists(h5_path):
                    print(f"[INFO] Importing {h5_path} (HDF5)...")
                    data[name] = self._read_h5_as_dataframe(h5_path)
                    continue
                print(f"[INFO] No HDF5 at {h5_path}; falling back to CSV")
            fp = os.path.join(folder_path, f"{name}.csv")
            print(f"[INFO] Importing {fp}...")
            data[name] = pd.read_csv(fp, index_col=0)
        return data

    @staticmethod
    def _read_h5_as_dataframe(h5_path: str) -> pd.DataFrame:
        """features-as-rows DataFrame from the samples-as-rows H5 layout."""
        with h5py.File(h5_path, "r") as f:
            arr = f["matrix"][:]
            sample_ids = [s.decode() for s in f["sample_ids"][:]]
            feature_names = [g.decode() for g in f["feature_names"][:]]
        return pd.DataFrame(
            np.ascontiguousarray(arr.T), index=feature_names, columns=sample_ids
        )

    def validate_data_folders(self, training_path: str, testing_path: str) -> None:
        for split, path in (("training", training_path), ("testing", testing_path)):
            if not os.path.isdir(path):
                raise ValueError(f"{split} folder does not exist: {path}")
            missing = []
            if not os.path.exists(os.path.join(path, "clin.csv")):
                missing.append("clin.csv")
            for dt in self.data_types:
                if not (
                    os.path.exists(os.path.join(path, f"{dt}.h5"))
                    or os.path.exists(os.path.join(path, f"{dt}.csv"))
                ):
                    missing.append(f"{dt}.h5 or {dt}.csv")
            if missing:
                raise ValueError(
                    f"Missing files in {split} folder: {', '.join(missing)}"
                )


def folder_has_h5(data_path: str, data_types) -> bool:
    """CLI auto-detection: any modality present as .h5 (reference __main__.py:1130-1140)."""
    for split in ("train", "test"):
        for dt in data_types:
            if os.path.exists(os.path.join(data_path, split, f"{dt}.h5")):
                return True
    return False
