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


def create_covariate_matrix(
    covariates: List[str],
    variable_types: Dict[str, str],
    ann: pd.DataFrame,
    groups_out: Dict[str, List[str]] = None,
) -> pd.DataFrame:
    """Features-as-rows covariate matrix from clinical variables.

    ``groups_out``: optional dict FILLED with {covariate -> its matrix
    column names} from the same encoding pass — the inference artifacts
    record it (post-harmonize) so the covariate-rebuild guard knows which
    columns belong to which covariate without name-prefix matching (which
    is ambiguous when one covariate's name prefixes another's) and
    without a second encoding pass that could desynchronize from this
    function's naming."""
    blocks = []
    names: List[str] = []
    for var in covariates:
        vtype = variable_types.get(var)
        if vtype == "categorical":
            one_hot = pd.get_dummies(ann[var], prefix=var).astype(int)
            blocks.append(one_hot.T)
            names.extend(one_hot.columns.tolist())
            if groups_out is not None:
                groups_out[var] = one_hot.columns.tolist()
        elif vtype == "numerical":
            col = ann[[var]].copy()
            col[var] = col[var].fillna(col[var].median())
            blocks.append(col.T)
            names.append(var)
            if groups_out is not None:
                groups_out[var] = [var]
        else:
            raise ValueError(f"Unknown variable type for {var}: {vtype}")
    mat = pd.concat(blocks, axis=0)
    mat.index = names
    mat.columns = ann.index
    return mat
