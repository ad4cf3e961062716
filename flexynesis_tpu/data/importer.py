"""Host-side multi-omics ingestion pipeline.

Capability parity with /root/reference/flexynesis/data.py (DataImporter,
data.py:22-688): CSV folder layout ``train/{dt}.csv + clin.csv`` and
``test/...``, validation, optional downsampling / user feature restriction,
variance+NA cleanup with median imputation, label alignment, Laplacian-score
feature selection (train only; delegated to the on-device JAX implementation
in ``feature_selection.py``), train/test harmonization, optional log1p,
StandardScaler fit-on-train/apply-to-test, covariate matrix, ordinal label
encoding (unknown -> -1), early-fusion concatenation.

The output is a ``MultiOmicDataset`` of contiguous float32 numpy matrices —
the device-resident representation the TPU trainer consumes directly.
"""

from __future__ import annotations

import os
from functools import reduce
from itertools import chain
from typing import Dict, List, Optional

import numpy as np
import pandas as pd
from sklearn.preprocessing import MinMaxScaler, OrdinalEncoder, StandardScaler

from .covariates import create_covariate_matrix, get_variable_types
from .dataset import MultiOmicDataset
from .feature_selection import filter_by_laplacian


class DataImporter:
    """Imports, cleans and preprocesses multi-omic CSV data folders."""

    def __init__(
        self,
        path: str,
        data_types: List[str],
        covariates: Optional[List[str]] = None,
        processed_dir: str = "processed",
        log_transform: bool = False,
        concatenate: bool = False,
        restrict_to_features: Optional[str] = None,
        min_features: Optional[int] = None,
        top_percentile: float = 20,
        correlation_threshold: float = 0.9,
        variance_threshold: float = 0.01,
        na_threshold: float = 0.1,
        downsample: int = 0,
    ):
        self.path = path
        self.data_types = list(data_types)
        self.processed_dir = os.path.join(path, processed_dir)
        self.covariates = covariates
        self.log_transform = log_transform
        self.concatenate = concatenate
        self.min_features = min_features
        self.top_percentile = top_percentile
        self.correlation_threshold = correlation_threshold
        self.variance_threshold = variance_threshold
        self.na_threshold = na_threshold
        self.downsample = downsample

        self.encoders: Dict[str, OrdinalEncoder] = {}
        self.scalers: Optional[Dict[str, object]] = None
        self.feature_logs: Dict[str, object] = {}
        # artifacts for inference mode
        self.train_features: Dict[str, List[str]] = {}
        self.label_encoders: Dict[str, OrdinalEncoder] = {}

        self.restrict_to_features = self._load_user_features(restrict_to_features)

    @staticmethod
    def _load_user_features(path: Optional[str]):
        if path is None:
            return None
        if not os.path.isfile(path):
            raise FileNotFoundError(f"File not found: {path}")
        with open(path) as fp:
            feats = [x.strip() for x in fp.read().splitlines() if x.strip()]
        return np.unique(feats)

    # ------------------------------------------------------------------ IO

    def validate_data_folders(self, training_path: str, testing_path: str) -> None:
        required = {"clin.csv"} | {f"{dt}.csv" for dt in self.data_types}
        for split, p in (("training", training_path), ("testing", testing_path)):
            present = set(os.listdir(p))
            missing = required - present
            if missing:
                raise ValueError(
                    f"Missing files in {split} folder: {', '.join(sorted(missing))}"
                )

    def read_data(self, folder_path: str) -> Dict[str, pd.DataFrame]:
        from .fastcsv import read_matrix_csv

        data = {}
        for name in ["clin"] + self.data_types:
            fp = os.path.join(folder_path, f"{name}.csv")
            print(f"[INFO] Importing {fp}...")
            if name == "clin":
                # mixed-type clinical table needs pandas dtype inference
                data[name] = pd.read_csv(fp, index_col=0)
            else:
                # numeric matrices go through the native parallel parser
                data[name] = read_matrix_csv(fp)
        return data

    def subsample(self, dat: Dict[str, pd.DataFrame], n: int):
        # reference analog is data.py:318, which samples UNSEEDED; seeding
        # here is a deliberate determinism improvement — an unseeded draw
        # made CLI runs order-dependent (a 50-sample draw can miss a class)
        clin = dat["clin"].sample(n, random_state=42)
        out = {x: dat[x][clin.index] for x in self.data_types}
        out["clin"] = clin
        return out

    def filter_by_features(self, dat, features):
        out = {
            key: (df if key == "clin" else df.loc[df.index.intersection(features)])
            for key, df in dat.items()
        }
        for key, df in out.items():
            if key != "clin":
                print(f"[INFO] layer '{key}': {len(df.index)} features after user filter")
        return out

    # ---------------------------------------------------------- validation

    def validate_input_data(self, train_dat, test_dat) -> None:
        errors, warnings = [], []
        for split, dat in (("train", train_dat), ("test", test_dat)):
            for name, df in dat.items():
                if not df.index.is_unique:
                    kind = "Sample labels" if name == "clin" else "Feature names"
                    errors.append(
                        f"Error in {split}/{name}.csv: {kind} in the first column must be unique."
                    )
            clin_samples = set(dat["clin"].index)
            for name, df in dat.items():
                if name == "clin":
                    continue
                overlap = clin_samples & set(df.columns)
                if not overlap:
                    errors.append(
                        f"Error: No matching sample labels between {split}/clin.csv and {split}/{name}.csv."
                    )
                elif len(overlap) < len(clin_samples):
                    warnings.append(
                        f"Warning: some samples in {split}/clin.csv are missing in {split}/{name}.csv"
                    )
        for name in train_dat:
            if name != "clin" and name in test_dat:
                if not (set(train_dat[name].index) & set(test_dat[name].index)):
                    errors.append(
                        f"Error: No common features between train/{name}.csv and test/{name}.csv."
                    )
        for w in warnings:
            print(f"[WARNING] {w}")
        if errors:
            for e in errors:
                print(f"[ERROR] {e}")
            raise ValueError("Input data validation failed; see errors above.")

    # ---------------------------------------------------------- processing

    def cleanup_data(self, df_dict: Dict[str, pd.DataFrame]):
        """Variance-quantile + NA-threshold feature filter, median imputation,
        and removal of zero-std samples common to all layers."""
        cleaned, sample_masks, logs = {}, [], {}
        for key, df in df_dict.items():
            variances = df.var(axis=1)
            na_pct = df.isna().mean(axis=1)
            log_df = pd.DataFrame(
                {
                    "feature": df.index,
                    "na_percent": na_pct,
                    "variance": variances,
                    "selected": False,
                }
            )
            vcut = variances.quantile(self.variance_threshold)
            keep = (variances >= vcut) & (na_pct < self.na_threshold)
            log_df["selected"] = keep.values
            logs[key] = log_df
            df = df.loc[keep]

            # degenerate-sample mask BEFORE imputation: a fully-missing sample
            # would otherwise become the median vector (nonzero std) and
            # silently survive the zero-std removal below
            pre_na_frac = df.isna().mean(axis=0)
            if df.isna().any().any():
                medians = df.median(axis=1)
                df = df.T.fillna(medians).T

            stds = df.std(axis=0)
            sample_masks.append((stds != 0) & stds.notna() & (pre_na_frac < 1.0))
            cleaned[key] = df
            print(f"[INFO] layer '{key}': kept {df.shape[0]} features after cleanup")

        common_mask = pd.DataFrame(sample_masks).all()
        for key in cleaned:
            cleaned[key] = cleaned[key].loc[:, common_mask]
        self.feature_logs["cleanup"] = logs
        return cleaned

    def get_labels(self, dat, ann):
        samples = list(
            reduce(set.intersection, [set(dat[x].columns) for x in dat.keys()])
        )
        samples = list(set(ann.index).intersection(samples))
        dat = {x: dat[x][samples] for x in dat.keys()}
        return dat, ann.loc[samples], samples

    def select_features(self, dat, laplacian_sample_cap: int = 10000):
        counts = {
            x: max(
                int(dat[x].shape[0] * self.top_percentile / 100),
                self.min_features or 0,
            )
            for x in dat.keys()
        }
        out, logs = {}, {}
        for layer in dat.keys():
            X = dat[layer].T  # samples x features
            X_score = (
                X.sample(n=laplacian_sample_cap, random_state=42)
                if X.shape[0] > laplacian_sample_cap
                else X
            )
            _, log_df = filter_by_laplacian(
                X=X_score,
                layer=layer,
                topN=counts[layer],
                correlation_threshold=self.correlation_threshold,
            )
            if "selected" in log_df.columns:
                chosen = log_df.loc[log_df["selected"], "feature"]
            else:
                chosen = log_df["feature"]
            out[layer] = X[chosen].T
            logs[layer] = log_df
        self.feature_logs["select_features"] = logs
        return out

    def process_data(self, data, split="train"):
        dat = self.cleanup_data({x: data[x] for x in self.data_types})
        dat, ann, samples = self.get_labels(dat, data["clin"])
        if split == "train" and self.top_percentile:
            dat = self.select_features(dat)
        features = {x: dat[x].index for x in dat.keys()}
        return dat, ann, samples, features

    @staticmethod
    def harmonize(dat1, dat2):
        common_layers = dat1.keys() & dat2.keys()
        common = {x: dat1[x].index.intersection(dat2[x].index) for x in common_layers}
        return (
            {x: dat1[x].loc[common[x]] for x in common_layers},
            {x: dat2[x].loc[common[x]] for x in common_layers},
        )

    @staticmethod
    def transform_data(data):
        return {x: np.log1p(data[x].T).T for x in data.keys()}

    def normalize_data(self, data, scaler_type="standard", fit=True):
        if fit:
            cls = {"standard": StandardScaler, "min_max": MinMaxScaler}.get(scaler_type)
            if cls is None:
                raise ValueError("Invalid scaler_type. Choose 'standard' or 'min_max'.")
            self.scalers = {x: cls().fit(data[x].T) for x in data.keys()}
        return {
            x: pd.DataFrame(
                self.scalers[x].transform(data[x].T),
                index=data[x].columns,
                columns=data[x].index,
            ).T
            for x in data.keys()
        }

    # ------------------------------------------------------------- labels

    def encode_labels(self, df: pd.DataFrame):
        label_mappings = {}

        def encode(series: pd.Series) -> np.ndarray:
            if series.name not in self.encoders:
                enc = OrdinalEncoder(
                    handle_unknown="use_encoded_value", unknown_value=-1
                )
                codes = enc.fit_transform(series.to_frame())
                self.encoders[series.name] = enc
                self.label_encoders[series.name] = enc
            else:
                codes = self.encoders[series.name].transform(series.to_frame())
            label_mappings[series.name] = {
                int(i): lbl
                for i, lbl in enumerate(self.encoders[series.name].categories_[0])
            }
            return codes.ravel()

        cat = df.select_dtypes(include=["object", "category", "str"]).apply(encode)
        encoded = pd.concat(
            [df.select_dtypes(exclude=["object", "category", "str"]), cat], axis=1
        )
        variable_types = {c: "categorical" for c in cat.columns}
        variable_types.update(
            {
                c: "numerical"
                for c in df.select_dtypes(exclude=["object", "category", "str"]).columns
            }
        )
        return encoded, variable_types, label_mappings

    def get_dataset(self, dat, ann, samples) -> MultiOmicDataset:
        features = {x: list(dat[x].index) for x in dat.keys()}
        mats = {
            x: np.ascontiguousarray(dat[x].T.values, dtype=np.float32)
            for x in dat.keys()
        }
        ann_enc, variable_types, label_mappings = self.encode_labels(ann)
        ann_arrays = {
            col: np.asarray(ann_enc[col].values, dtype=np.float32)
            for col in ann_enc.columns
        }
        return MultiOmicDataset(
            dat=mats,
            ann=ann_arrays,
            variable_types=variable_types,
            features=features,
            samples=list(samples),
            label_mappings=label_mappings,
        )

    # ---------------------------------------------------------------- main

    def import_data(self):
        print("[INFO] ================= Importing Data =================")
        training_path = os.path.join(self.path, "train")
        testing_path = os.path.join(self.path, "test")
        self.validate_data_folders(training_path, testing_path)

        train_dat = self.read_data(training_path)
        test_dat = self.read_data(testing_path)

        if self.downsample > 0:
            print(f"[INFO] Randomly drawing {self.downsample} training samples")
            train_dat = self.subsample(train_dat, self.downsample)
        if self.restrict_to_features is not None:
            train_dat = self.filter_by_features(train_dat, self.restrict_to_features)
            test_dat = self.filter_by_features(test_dat, self.restrict_to_features)

        self.validate_input_data(train_dat, test_dat)

        train_mats, train_ann, train_samples, _ = self.process_data(
            train_dat, split="train"
        )
        test_mats, test_ann, test_samples, _ = self.process_data(
            test_dat, split="test"
        )
        train_mats, test_mats = self.harmonize(train_mats, test_mats)

        if self.log_transform:
            print("[INFO] log1p-transforming data")
            train_mats = self.transform_data(train_mats)
            test_mats = self.transform_data(test_mats)

        train_mats = self.normalize_data(train_mats, "standard", fit=True)
        test_mats = self.normalize_data(test_mats, "standard", fit=False)

        if self.covariates:
            print(f"[INFO] Building covariate matrix: {self.covariates}")
            # per-covariate column grouping for the inference artifacts
            # (the rebuild guard needs to know which trained columns
            # belong to which covariate); filled by the same encoding pass
            groups: dict = {}
            train_mats["covariates"] = create_covariate_matrix(
                self.covariates, get_variable_types(train_ann), train_ann,
                groups_out=groups,
            )
            test_mats["covariates"] = create_covariate_matrix(
                self.covariates, get_variable_types(test_ann), test_ann
            )
            train_mats, test_mats = self.harmonize(train_mats, test_mats)
            # harmonize() intersects the train/test covariate ROWS, so the
            # recorded groups must keep only columns the model actually
            # trains on — pre-harmonize levels would let the inference
            # guard pass via a never-trained column
            kept = set(train_mats["covariates"].index)
            self.covariate_columns = {
                v: [c for c in cols if c in kept] for v, cols in groups.items()
            }

        training_dataset = self.get_dataset(train_mats, train_ann, train_samples)
        testing_dataset = self.get_dataset(test_mats, test_ann, test_samples)

        if self.concatenate:
            for ds in (training_dataset, testing_dataset):
                order = [m for m in self.data_types if m in ds.dat]
                extra = [m for m in ds.dat if m not in order]
                order += extra
                ds.dat = {
                    "all": np.concatenate([ds.dat[x] for x in order], axis=1)
                }
                ds.features = {
                    "all": list(chain(*[ds.features[x] for x in order]))
                }

        self.train_features = dict(training_dataset.features)

        print("[INFO] Training Data Stats:", training_dataset.get_dataset_stats())
        print("[INFO] Test Data Stats:", testing_dataset.get_dataset_stats())

        logs = self.feature_logs
        if "select_features" in logs:
            self.feature_logs = {
                x: pd.merge(
                    logs["cleanup"][x],
                    logs["select_features"][x],
                    on="feature",
                    how="outer",
                    suffixes=["_cleanup", "_laplacian"],
                )
                for x in self.data_types
            }
        else:
            self.feature_logs = logs["cleanup"]
        print("[INFO] Data import successful.")
        return training_dataset, testing_dataset
