"""CSV -> HDF5 converter CLI.

Capability parity with /root/reference/flexynesis/csv_to_h5.py: streams a
features-as-rows CSV into the HDF5 layout consumed by H5DataImporter
(``/matrix`` samples-as-rows float32, ``/sample_ids``, ``/feature_names``),
chunked per sample to roughly halve peak memory.

Usage: python -m flexynesis_tpu.csv_to_h5 --input in.csv --output out.h5
       python -m flexynesis_tpu.csv_to_h5 --input data_dir --output out_dir
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import h5py
import numpy as np
import pandas as pd

DEFAULT_CHUNKSIZE = 2000


def convert_csv_to_h5(src_csv, dst_h5, chunksize: int = DEFAULT_CHUNKSIZE) -> Path:
    """Convert one feature-matrix CSV (features x samples) to HDF5."""
    src_csv, dst_h5 = Path(src_csv), Path(dst_h5)
    if not src_csv.exists():
        raise FileNotFoundError(f"Input CSV not found: {src_csv}")
    dst_h5.parent.mkdir(parents=True, exist_ok=True)

    sample_ids = pd.read_csv(src_csv, nrows=0, index_col=0).columns.tolist()
    feature_names = (
        pd.read_csv(src_csv, index_col=0, usecols=[0]).index.astype(str).tolist()
    )
    n_samples, n_features = len(sample_ids), len(feature_names)
    print(f"[INFO] {src_csv.name}: {n_samples:,} samples x {n_features:,} features")

    with h5py.File(dst_h5, "w") as f:
        # chunk layout follows the WRITE pattern (column slices of
        # `chunksize` features): per-sample-row chunks would force a
        # read-modify-write of every chunk on every slice — a full-matrix
        # rewrite per CSV chunk (~n_features/chunksize x write
        # amplification). Readers load /matrix whole, so they're
        # insensitive to the layout.
        # cap the chunk at 32 MiB: h5py rejects chunks over 4 GiB, and a
        # huge --chunksize would otherwise produce one (4096 rows x
        # 300k-feature chunk ≈ 4.9 GB)
        chunk_cols = max(1, min(chunksize, n_features))
        chunk_rows = max(
            1, min(n_samples, 4096, (32 << 20) // (4 * chunk_cols))
        )
        mat = f.create_dataset(
            "matrix",
            shape=(n_samples, n_features),
            dtype=np.float32,
            chunks=(
                (chunk_rows, chunk_cols) if n_features and n_samples else None
            ),
        )
        row = 0
        for chunk in pd.read_csv(src_csv, index_col=0, chunksize=chunksize):
            vals = chunk.to_numpy(dtype=np.float32)
            # incoming rows are features; place transposed into sample rows
            mat[:, row : row + vals.shape[0]] = vals.T
            row += vals.shape[0]
        if row != n_features:
            raise ValueError(
                f"Row mismatch: expected {n_features} features, read {row}"
            )
        f.create_dataset(
            "sample_ids", data=np.array(sample_ids, dtype="S")
        )
        f.create_dataset(
            "feature_names", data=np.array(feature_names, dtype="S")
        )
    print(f"[INFO] Wrote {dst_h5}")
    return dst_h5


def main(argv=None):
    ap = argparse.ArgumentParser(description="Convert flexynesis CSVs to HDF5")
    ap.add_argument("--input", required=True, help="CSV file or folder of CSVs")
    ap.add_argument("--output", required=True, help="Output .h5 file or folder")
    ap.add_argument("--chunksize", type=int, default=DEFAULT_CHUNKSIZE)
    ap.add_argument(
        "--exclude", default="clin", help="Comma-separated basenames to skip"
    )
    args = ap.parse_args(argv)

    src = Path(args.input)
    excl = set(args.exclude.split(","))
    if src.is_dir():
        out_dir = Path(args.output)
        for csv in sorted(src.glob("*.csv")):
            if csv.stem in excl:
                continue
            convert_csv_to_h5(csv, out_dir / f"{csv.stem}.h5", args.chunksize)
    else:
        convert_csv_to_h5(src, args.output, args.chunksize)


if __name__ == "__main__":
    main()
