"""Synthetic multi-omics dataset generator.

The reference tests against downloaded public datasets
(models-template.yml:33-51); we instead generate structured synthetic data so
unit tests, CI and benchmarks are hermetic. Data has real signal: latent
cluster structure drives both the omic matrices and the clinical labels, so
models can actually learn and metrics are meaningful.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional

import numpy as np
import pandas as pd


def make_synthetic_frames(
    n_train: int = 120,
    n_test: int = 60,
    n_features: Dict[str, int] = None,
    n_classes: int = 3,
    seed: int = 0,
    survival: bool = True,
    missing_label_rate: float = 0.05,
    nan_rate: float = 0.01,
):
    """Returns ({split: {layer: df, 'clin': df}}) in flexynesis folder layout
    (features-as-rows matrices, samples-as-rows clin)."""
    n_features = n_features or {"gex": 200, "cnv": 150}
    rng = np.random.default_rng(seed)
    out = {}
    n_all = n_train + n_test
    centers = {
        layer: rng.normal(0, 2.0, size=(n_classes, nf))
        for layer, nf in n_features.items()
    }
    cls = rng.integers(0, n_classes, size=n_all)
    sample_ids = [f"S{i:05d}" for i in range(n_all)]

    mats = {}
    for layer, nf in n_features.items():
        X = centers[layer][cls] + rng.normal(0, 1.0, size=(n_all, nf))
        mask = rng.random(X.shape) < nan_rate
        X[mask] = np.nan
        mats[layer] = X

    # clinical table
    age = 50 + 5 * cls + rng.normal(0, 3, n_all)
    risk = 0.8 * cls + 0.02 * (age - 50)
    time = rng.exponential(np.exp(-risk) * 20)
    event = (rng.random(n_all) < 0.7).astype(float)
    labels = np.array([f"grp{c}" for c in cls], dtype=object)
    miss = rng.random(n_all) < missing_label_rate
    labels[miss] = np.nan

    clin = pd.DataFrame(
        {"subtype": labels, "age": age},
        index=sample_ids,
    )
    if survival:
        clin["OS_MONTHS"] = time
        clin["OS_STATUS"] = event

    for split, sl in (("train", slice(0, n_train)), ("test", slice(n_train, n_all))):
        ids = sample_ids[sl]
        d = {
            layer: pd.DataFrame(
                mats[layer][sl].T,
                index=[f"{layer}_f{j}" for j in range(n_features[layer])],
                columns=ids,
            )
            for layer in n_features
        }
        d["clin"] = clin.loc[ids]
        out[split] = d
    return out


def write_synthetic_folder(
    path: str,
    n_train: int = 120,
    n_test: int = 60,
    n_features: Optional[Dict[str, int]] = None,
    n_classes: int = 3,
    seed: int = 0,
    survival: bool = True,
) -> List[str]:
    """Write the synthetic dataset as train/ + test/ CSV folders; returns layers."""
    frames = make_synthetic_frames(
        n_train=n_train,
        n_test=n_test,
        n_features=n_features,
        n_classes=n_classes,
        seed=seed,
        survival=survival,
    )
    layers = [k for k in frames["train"].keys() if k != "clin"]
    for split, d in frames.items():
        os.makedirs(os.path.join(path, split), exist_ok=True)
        for name, df in d.items():
            df.to_csv(os.path.join(path, split, f"{name}.csv"))
    return layers
