"""Clinical covariate matrix construction.

Parity with /root/reference/flexynesis/utils.py:1702-1764: categorical
covariates are one-hot encoded 0/1, numerical covariates are median-imputed;
the result is a features-x-samples DataFrame appended as an extra
"covariates" modality.
"""

from __future__ import annotations

from typing import Dict, List

import pandas as pd


def get_variable_types(df: pd.DataFrame) -> Dict[str, str]:
    """'categorical' for object/category dtypes, 'numerical' otherwise."""
    types = {
        col: "categorical"
        for col in df.select_dtypes(include=["object", "category", "str"]).columns
    }
    types.update(
        {
            col: "numerical"
            for col in df.select_dtypes(exclude=["object", "category", "str"]).columns
        }
    )
    return types


def covariate_column_groups(
    covariates: List[str], variable_types: Dict[str, str], ann: pd.DataFrame
) -> Dict[str, List[str]]:
    """{covariate -> its matrix column names}, mirroring
    ``create_covariate_matrix``'s naming (``var_<level>`` one-hot columns
    for categorical, ``var`` itself for numerical). Recorded in the
    inference artifacts so the covariate-rebuild guard knows exactly which
    columns belong to which covariate (name-prefix matching is ambiguous
    when one covariate's name prefixes another's)."""
    groups: Dict[str, List[str]] = {}
    for var in covariates:
        if variable_types.get(var) == "categorical":
            groups[var] = pd.get_dummies(ann[var], prefix=var).columns.tolist()
        else:
            groups[var] = [var]
    return groups


def create_covariate_matrix(
    covariates: List[str], variable_types: Dict[str, str], ann: pd.DataFrame
) -> pd.DataFrame:
    """Features-as-rows covariate matrix from clinical variables."""
    blocks = []
    names: List[str] = []
    for var in covariates:
        vtype = variable_types.get(var)
        if vtype == "categorical":
            one_hot = pd.get_dummies(ann[var], prefix=var).astype(int)
            blocks.append(one_hot.T)
            names.extend(one_hot.columns.tolist())
        elif vtype == "numerical":
            col = ann[[var]].copy()
            col[var] = col[var].fillna(col[var].median())
            blocks.append(col.T)
            names.append(var)
        else:
            raise ValueError(f"Unknown variable type for {var}: {vtype}")
    mat = pd.concat(blocks, axis=0)
    mat.index = names
    mat.columns = ann.index
    return mat
