"""ctypes binding for the native multi-threaded CSV matrix parser.

The C++ loader (native/fastcsv.cpp) mmaps numeric feature matrices and
parses them in parallel straight into a float32 buffer — replacing the
reference's pandas.read_csv hot path for omics matrices (data.py:286-314).
The shared library auto-builds with g++ on first use; pandas remains the
fallback when no toolchain is available (and always handles clin.csv, whose
columns are mixed-type).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np
import pandas as pd

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libfastcsv.so"))
_lib = None
_build_failed = False


class _FcsvMatrix(ctypes.Structure):
    _fields_ = [
        ("data", ctypes.POINTER(ctypes.c_float)),
        ("n_rows", ctypes.c_int64),
        ("n_cols", ctypes.c_int64),
        ("row_names", ctypes.POINTER(ctypes.c_char)),
        ("row_names_len", ctypes.c_int64),
        ("col_names", ctypes.POINTER(ctypes.c_char)),
        ("col_names_len", ctypes.c_int64),
        ("error", ctypes.c_char_p),
    ]


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    if not os.path.exists(_LIB_PATH):
        src = os.path.join(_NATIVE_DIR, "fastcsv.cpp")
        if not os.path.exists(src):
            _build_failed = True
            return None
        try:
            subprocess.run(
                ["make", "-C", os.path.abspath(_NATIVE_DIR)],
                check=True,
                capture_output=True,
                timeout=120,
            )
        except Exception as e:  # no toolchain -> pandas fallback
            print(f"[WARN] fastcsv native build failed ({e}); using pandas")
            _build_failed = True
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.fastcsv_read.restype = ctypes.POINTER(_FcsvMatrix)
        lib.fastcsv_read.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.fastcsv_free.argtypes = [ctypes.POINTER(_FcsvMatrix)]
        _lib = lib
        return lib
    except OSError as e:
        print(f"[WARN] fastcsv load failed ({e}); using pandas")
        _build_failed = True
        return None


def _split_names(blob_ptr, blob_len: int, count: int):
    raw = ctypes.string_at(blob_ptr, blob_len)
    names = raw.decode("utf-8", errors="replace").split("\x00")
    return names[:count]


def read_matrix_csv(
    path: str, n_threads: int = 0, fallback: bool = True
) -> pd.DataFrame:
    """Numeric features-as-rows CSV -> DataFrame (float32 values)."""
    lib = _ensure_built()
    if lib is None:
        if not fallback:
            raise RuntimeError("fastcsv native library unavailable")
        return pd.read_csv(path, index_col=0)
    ptr = lib.fastcsv_read(path.encode(), int(n_threads))
    try:
        m = ptr.contents
        if m.error:
            msg = m.error.decode()
            if fallback:
                print(f"[WARN] {msg}; using pandas for {path}")
                return pd.read_csv(path, index_col=0)
            raise RuntimeError(msg)
        n_rows, n_cols = int(m.n_rows), int(m.n_cols)
        # one flat memmove — NOT np.ctypeslib.as_array, which constructs a
        # ((c_float*n_cols)*n_rows) ctypes type: building that type costs
        # seconds at matrix scale (measured 2.3-3.5s for 5000x1000, twice
        # per shape before ctypes' type cache kicks in) and was 10x the
        # actual parse
        arr = np.empty((n_rows, n_cols), dtype=np.float32)
        ctypes.memmove(arr.ctypes.data, m.data, arr.nbytes)
        rows = _split_names(m.row_names, m.row_names_len, n_rows)
        cols = _split_names(m.col_names, m.col_names_len, n_cols)
        return pd.DataFrame(arr, index=rows, columns=cols)
    finally:
        lib.fastcsv_free(ptr)
