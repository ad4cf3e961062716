"""Inference-mode data importer: apply training artifacts to a test folder.

Capability parity with /root/reference/flexynesis/data.py:691-942
(DataImporterInference): loads test-only ``{modality}.csv`` (+ clin.csv),
validates/reorders features against each stored scaler's
``feature_names_in_``, applies the fitted scalers, intersects samples across
modalities, rebuilds the covariate modality from clin.csv, re-encodes labels
with the stored OrdinalEncoders (missing -> -1), and re-concatenates for
early fusion using the training modality order.
"""

from __future__ import annotations

import os
from itertools import chain
from typing import Optional

import numpy as np
import pandas as pd

from .covariates import create_covariate_matrix, get_variable_types
from .dataset import MultiOmicDataset


def _encoder_mapping(enc) -> dict:
    """code -> class-name mapping from a fitted OrdinalEncoder, with -1
    (the unseen/missing sentinel) mapped to 'Unknown'."""
    mapping = {int(i): c for i, c in enumerate(enc.categories_[0])}
    mapping[-1] = "Unknown"
    return mapping


class DataImporterInference:
    def __init__(self, test_data_path: str, artifacts_path, verbose: bool = True):
        from ..inference import load_and_sniff_artifacts

        self.test_data_path = test_data_path
        self.verbose = verbose
        self.artifacts = (
            artifacts_path
            if isinstance(artifacts_path, dict)
            else load_and_sniff_artifacts(artifacts_path)
        )
        a = self.artifacts
        self.feature_names = a.get("feature_lists", a.get("feature_names", {}))
        self.scalers = a.get("transforms", a.get("scalers", {}))
        self.label_encoders = a.get("label_encoders", {})
        self.modalities = list(a.get("data_types", a.get("modalities", [])))
        self.target_variables = a.get("target_variables", [])
        if verbose:
            print(f"[INFO] Loaded artifacts for modalities: {self.modalities}")

    def import_data(self) -> MultiOmicDataset:
        early_fusion = self.modalities == ["all"]
        if early_fusion:
            to_load = list(self.artifacts.get("original_modalities", []))
            if not to_load:
                raise ValueError(
                    "Early fusion artifacts must record original_modalities."
                )
        else:
            to_load = [m for m in self.modalities if m != "covariates"]

        clin_path = os.path.join(self.test_data_path, "clin.csv")
        labels_df = (
            pd.read_csv(clin_path, index_col=0) if os.path.exists(clin_path) else None
        )

        mats = {}
        samples: Optional[list] = None
        for modality in to_load:
            fp = os.path.join(self.test_data_path, f"{modality}.csv")
            if not os.path.exists(fp):
                raise FileNotFoundError(f"Required file not found: {fp}")
            df = pd.read_csv(fp, index_col=0).T  # -> samples x features
            scaler = self.scalers[modality]
            expected = list(scaler.feature_names_in_)
            missing = set(expected) - set(df.columns)
            if missing:
                raise ValueError(
                    f"{modality}: test data is missing {len(missing)} features "
                    "required by the trained model."
                )
            extra = set(df.columns) - set(expected)
            if extra and self.verbose:
                print(f"[INFO] {modality}: ignoring {len(extra)} extra features")
            df = df[expected]
            scaled = pd.DataFrame(
                scaler.transform(df), index=df.index, columns=df.columns
            )
            n_missing = int(scaled.isna().sum().sum())
            if n_missing:
                # impute missing cells with the training mean (0 after
                # standardization) — the training importer median-imputes,
                # but only the fitted scalers are carried in the artifacts
                print(
                    f"[INFO] {modality}: imputing {n_missing} missing values "
                    "with the training mean"
                )
                scaled = scaled.fillna(0.0)
            mats[modality] = scaled
            if samples is None:
                samples = df.index.tolist()

        if mats:
            common = set.intersection(*[set(df.index) for df in mats.values()])
            samples = [s for s in samples if s in common]
            mats = {m: df.loc[samples] for m, df in mats.items()}

        # Rebuild covariates when the training run used them — including
        # under early fusion, where the TRAINING importer concatenates the
        # covariate block into 'all' (importer.py:386-396; the reference
        # instead silently drops covariates from its early-fusion concat,
        # reference data.py:233-257 — a deviation we do not reproduce).
        needs_covariates = "covariates" in self.modalities or (
            early_fusion and bool(self.artifacts.get("covariate_vars"))
        )
        if needs_covariates and labels_df is not None:
            cov_vars = self.artifacts.get("covariate_vars", [])
            if cov_vars:
                if self.verbose:
                    print(f"[INFO] Rebuilding covariate matrix for: {cov_vars}")
                cov = create_covariate_matrix(
                    cov_vars, get_variable_types(labels_df), labels_df
                ).T  # -> samples x features
                # Reindex against the TRAINING covariate columns: the test
                # clin.csv may lack category levels seen in training (or
                # carry new ones), and one-hot columns must align
                # positionally with the trained input width. Missing
                # training columns zero-fill (the one-hot "level absent"
                # encoding); unseen test levels are dropped.
                col_groups = self.artifacts.get("covariate_columns") or {}
                if early_fusion:
                    recorded = {
                        c for cols in col_groups.values() for c in cols
                    }
                    if recorded:
                        # the recorded per-covariate groups are
                        # authoritative: a covariate one-hot column whose
                        # name collides with an omics feature would be
                        # misclassified as omics by the set-difference
                        # below (zero-filling it and skewing the reindex).
                        # Intersect with the trained 'all' block so groups
                        # recorded pre-harmonize by older artifacts cannot
                        # inject never-trained columns.
                        train_cov_cols = [
                            f for f in self.feature_names["all"]
                            if f in recorded
                        ]
                    else:  # older artifacts: set-difference fallback
                        omics_feats = set(
                            chain(*[
                                list(self.scalers[m].feature_names_in_)
                                for m in to_load
                            ])
                        )
                        train_cov_cols = [
                            f for f in self.feature_names["all"]
                            if f not in omics_feats
                        ]
                else:
                    train_cov_cols = list(
                        self.feature_names.get("covariates", cov.columns)
                    )
                train_set = set(train_cov_cols)
                cov_set = set(cov.columns)
                dropped = [c for c in cov.columns if c not in train_set]
                filled = [c for c in train_cov_cols if c not in cov_set]
                # per-covariate guard: if EVERY trained column of one
                # covariate zero-fills, the model would consume an all-zero
                # block for it while the strict 'all' check below still
                # passes (e.g. a covariate one-hot in training parses
                # numerical here, or its levels are spelled differently) —
                # a whole-block-overlap check would let one healthy
                # covariate mask another's silent degradation. Column
                # ownership comes from the artifacts ('covariate_columns',
                # recorded at training); name-prefix matching is the
                # fallback for older artifacts (ambiguous when one
                # covariate's name prefixes another's).
                for var in cov_vars:
                    cols_v = col_groups.get(var) or [
                        c for c in train_cov_cols
                        if c == var or c.startswith(f"{var}_")
                    ]
                    # only TRAINED columns count: a recorded group could
                    # carry levels the model never trained on (older
                    # artifacts recorded groups pre-harmonize), and a
                    # never-trained column must not satisfy the guard
                    cols_v = [c for c in cols_v if c in train_set]
                    if cols_v and not any(c in cov_set for c in cols_v):
                        raise ValueError(
                            f"Inference covariates: none of '{var}'s "
                            f"trained columns ({cols_v[:5]}) can be rebuilt "
                            "from the test clin.csv (rebuilt columns: "
                            f"{list(cov.columns)[:8]}). The test cohort "
                            "likely encodes this covariate with different "
                            "types/levels than the training data."
                        )
                if (dropped or filled) and self.verbose:
                    print(
                        f"[INFO] covariates: aligning to training columns "
                        f"({len(filled)} zero-filled, {len(dropped)} unseen "
                        "test levels dropped)"
                    )
                cov = cov.reindex(columns=train_cov_cols, fill_value=0.0)
                if samples is None:
                    samples = cov.index.tolist()
                mats["covariates"] = cov

        ann, variable_types, label_mappings = {}, {}, {}
        if labels_df is not None:
            common_samples = [s for s in samples if s in set(labels_df.index)]
            labels_df = labels_df.loc[common_samples]
            mats = {m: df.loc[common_samples] for m, df in mats.items()}
            samples = common_samples

            for col in labels_df.columns:
                enc = self.label_encoders.get(col)
                if enc is not None:
                    valid = ~labels_df[col].isna()
                    encoded = np.full(len(labels_df), -1, dtype=np.float32)
                    if valid.sum() > 0:
                        encoded[valid.to_numpy()] = (
                            enc.transform(
                                labels_df.loc[valid, col].to_numpy().reshape(-1, 1)
                            ).ravel()
                        )
                    ann[col] = encoded
                    variable_types[col] = "categorical"
                    label_mappings[col] = _encoder_mapping(enc)
                else:
                    ann[col] = labels_df[col].to_numpy(dtype=np.float32)
                    variable_types[col] = "numerical"

        # unlabeled cohort support (no clin.csv, or clin missing a trained
        # target): class names and variable kinds still resolve from the
        # trained encoders so predicted_labels.csv carries real labels;
        # ann stays absent -> known_label is NaN and evaluate_wrapper
        # skips the variable (no ground truth to score against). The
        # reference requires a clin.csv even for unlabeled cohorts.
        for var, enc in self.label_encoders.items():
            if var not in variable_types:
                variable_types[var] = "categorical"
                label_mappings[var] = _encoder_mapping(enc)
        for var in self.target_variables:
            variable_types.setdefault(var, "numerical")

        if early_fusion:
            features = {
                m: list(self.scalers[m].feature_names_in_) for m in to_load
            }
            if "covariates" in mats:
                features["covariates"] = list(mats["covariates"].columns)
        else:
            features = {
                m: list(self.feature_names[m])
                for m in self.modalities
                if m in self.feature_names
            }

        ordered = [
            m
            for m in (
                to_load + ["covariates"] if early_fusion else self.modalities
            )
            if m in mats
        ]
        dat = {
            m: np.ascontiguousarray(mats[m].values, dtype=np.float32)
            for m in ordered
        }

        dataset = MultiOmicDataset(
            dat=dat,
            ann=ann,
            variable_types=variable_types,
            features=features,
            samples=list(samples or []),
            label_mappings=label_mappings,
        )

        if early_fusion:
            order = list(self.artifacts.get("original_modalities", ordered))
            # training concat order: data_types first, then the covariate
            # block appended (importer.py:388-391 order + extras)
            if "covariates" in dat and "covariates" not in order:
                order.append("covariates")
            concat = np.concatenate([dat[m] for m in order], axis=1)
            all_feats = list(chain(*[features[m] for m in order]))
            expected_list = list(self.feature_names["all"])
            expected_all = set(expected_list)
            keep = [i for i, f in enumerate(all_feats) if f in expected_all]
            kept_feats = [all_feats[i] for i in keep]
            if kept_feats != expected_list:
                missing = sorted(expected_all - set(kept_feats))
                if missing:
                    detail = (
                        f"{len(missing)} trained features unmatched, "
                        f"e.g. {missing[:5]}"
                    )
                else:  # same feature set, wrong order or duplicates
                    diff = next(
                        (
                            i
                            for i, (a, b) in enumerate(zip(kept_feats, expected_list))
                            if a != b
                        ),
                        min(len(kept_feats), len(expected_list)),
                    )
                    detail = (
                        "features match but the order/multiplicity differs "
                        f"(got {len(kept_feats)} vs {len(expected_list)} "
                        f"trained; first difference at index {diff})"
                    )
                raise ValueError(
                    "Early-fusion inference: test features do not "
                    f"reproduce the trained 'all' block ({detail}). "
                    "Check that the test folder carries every training "
                    "modality (and clinical covariates, if trained with "
                    "--covariates)."
                )
            dataset.dat = {"all": concat[:, keep]}
            dataset.features = {"all": kept_feats}
        return dataset
