"""Data layer: ingestion, preprocessing, datasets, graphs."""

from .covariates import create_covariate_matrix, get_variable_types
from .dataset import MultiOmicDataset, MultiOmicDatasetNW, TripletMultiOmicDataset
from .feature_selection import filter_by_laplacian, laplacian_score
from .importer import DataImporter

__all__ = [
    "DataImporter",
    "MultiOmicDataset",
    "MultiOmicDatasetNW",
    "TripletMultiOmicDataset",
    "filter_by_laplacian",
    "laplacian_score",
    "create_covariate_matrix",
    "get_variable_types",
]
