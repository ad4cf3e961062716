"""cBioPortal study fetcher.

Capability parity with /root/reference/flexynesis/utils.py:1967-2118
(CBioPortalData): downloads/extracts a study archive from the cBioPortal
datahub, reads selected data files, binarizes mutation tables into a
gene x sample 0/1 matrix, and writes a train/test split in the framework's
expected folder layout (train/{dt}.csv + clin.csv, test/...).
"""

from __future__ import annotations

import os
import tarfile
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


class CBioPortalData:
    def __init__(
        self,
        study_id: str,
        base_url: str = "https://datahub.assets.cbioportal.org",
        cache_dir: Optional[str] = None,
    ):
        self.study_id = study_id
        self.base_url = base_url
        from ..data.graph import get_cache_dir

        self.cache_dir = cache_dir or get_cache_dir()
        os.makedirs(self.cache_dir, exist_ok=True)
        self.study_dir = os.path.join(self.cache_dir, study_id)
        self.dat: Dict[str, pd.DataFrame] = {}

    # ------------------------------------------------------------ download

    def download_study_archive(self, force: bool = False, timeout: int = 120):
        archive = os.path.join(self.cache_dir, f"{self.study_id}.tar.gz")
        if os.path.exists(archive) and not force:
            return archive
        import requests

        url = f"{self.base_url}/{self.study_id}.tar.gz"
        print(f"[INFO] Downloading {url}")
        r = requests.get(url, stream=True, timeout=timeout)
        r.raise_for_status()
        tmp = archive + ".part"
        with open(tmp, "wb") as fh:
            for chunk in r.iter_content(1 << 20):
                fh.write(chunk)
        os.replace(tmp, archive)
        return archive

    def extract_archive(self, archive_path: str) -> str:
        with tarfile.open(archive_path, "r:gz") as tar:
            tar.extractall(self.cache_dir, filter="data")
        return self.study_dir

    def print_data_files(self) -> None:
        for f in sorted(os.listdir(self.study_dir)):
            print(f)

    # ------------------------------------------------------------- reading

    def read_data(self, files: Optional[Dict[str, str]] = None):
        """files: {short_name: filename} e.g. {'mut': 'data_mutations.txt'}."""
        files = files or {
            "clin": "data_clinical_patient.txt",
            "mut": "data_mutations.txt",
        }
        out = {}
        for name, fname in files.items():
            fp = os.path.join(self.study_dir, fname)
            df = pd.read_csv(fp, sep="\t", comment="#", low_memory=False)
            out[name] = self.process_data(df) if name != "mut" else df
        if "mut" in out:
            out["mut"] = self.binarize_mutations(out["mut"])
        self.dat = out
        return out

    @staticmethod
    def process_data(df: pd.DataFrame) -> pd.DataFrame:
        id_col = next(
            (c for c in ("PATIENT_ID", "SAMPLE_ID") if c in df.columns), None
        )
        if id_col:
            df = df.set_index(id_col)
        return df

    @staticmethod
    def binarize_mutations(df: pd.DataFrame) -> pd.DataFrame:
        """gene x sample 0/1 mutation matrix from a long mutations table."""
        gene_col = "Hugo_Symbol"
        sample_col = (
            "Tumor_Sample_Barcode"
            if "Tumor_Sample_Barcode" in df.columns
            else "SAMPLE_ID"
        )
        mat = (
            df.groupby([gene_col, sample_col]).size().unstack(fill_value=0)
        )
        return (mat > 0).astype(int)

    # ----------------------------------------------------------- split/write

    def get_cbioportal_data(self, study_id: str, files=None):
        archive = self.download_study_archive()
        self.extract_archive(archive)
        return self.read_data(files)

    def split_data(self, samples: Optional[List[str]] = None, ratio: float = 0.7):
        """Random train/test sample split across all loaded matrices."""
        if not self.dat:
            raise RuntimeError("No data loaded; call read_data first.")
        if samples is None:
            sets = []
            for name, df in self.dat.items():
                sets.append(set(df.index if name == "clin" else df.columns))
            samples = sorted(set.intersection(*sets))
        rng = np.random.default_rng(42)
        perm = rng.permutation(len(samples))
        n_train = int(len(samples) * ratio)
        train = [samples[i] for i in perm[:n_train]]
        test = [samples[i] for i in perm[n_train:]]
        out = {"train": {}, "test": {}}
        for name, df in self.dat.items():
            if name == "clin":
                out["train"][name] = df.loc[df.index.intersection(train)]
                out["test"][name] = df.loc[df.index.intersection(test)]
            else:
                out["train"][name] = df[[c for c in train if c in df.columns]]
                out["test"][name] = df[[c for c in test if c in df.columns]]
        return out

    @staticmethod
    def print_dataset(dataset: dict, outdir: str) -> None:
        """Write the split in the framework's train/test folder layout."""
        for split, tables in dataset.items():
            d = os.path.join(outdir, split)
            os.makedirs(d, exist_ok=True)
            for name, df in tables.items():
                df.to_csv(os.path.join(d, f"{name}.csv"))
        print(f"[INFO] Wrote dataset folders under {outdir}")
