"""Parallel execution: device meshes, vmapped trials, multi-host helpers."""

from .distributed import initialize, partition_trials
from .mesh import data_sharding, get_mesh, replicated, trial_sharding
from .trials import ParallelTrials

__all__ = [
    "get_mesh",
    "trial_sharding",
    "data_sharding",
    "replicated",
    "ParallelTrials",
    "initialize",
    "partition_trials",
]
