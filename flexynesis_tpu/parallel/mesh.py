"""Device-mesh helpers.

The reference is single-process/single-device (pl.Trainer(devices=1),
main.py:223-224; SURVEY.md §2.3). Here parallel scaling is expressed through
jax.sharding: a Mesh + NamedShardings, with XLA inserting the collectives
over ICI. Axes used by the framework:

* ``trial`` — HPO-trial parallelism: stacked per-trial parameter pytrees are
  sharded along their leading axis, one (or more) trials per device.
* ``data``  — batch (data-parallel) sharding for single-model training.
* ``model`` — tensor-parallel sharding of the widest encoder layers along
  the feature/hidden dimension.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(axes: Sequence[Tuple[str, int]] = (("data", -1),)) -> Mesh:
    """Build a mesh over all available devices.

    ``axes`` is a sequence of (name, size); one size may be -1 (inferred).
    """
    devices = np.asarray(jax.devices())
    sizes = [s for _, s in axes]
    if -1 in sizes:
        known = int(np.prod([s for s in sizes if s != -1]))
        sizes[sizes.index(-1)] = len(devices) // known
    shape = tuple(sizes)
    return Mesh(devices[: int(np.prod(shape))].reshape(shape),
                tuple(n for n, _ in axes))


def trial_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding for stacked per-trial pytrees."""
    return NamedSharding(mesh, P("trial"))


def auto_trial_mesh(n_trials: int):
    """Trial mesh over this process's LOCAL devices when ``n_trials``
    divides evenly; None otherwise (plain vmap).

    Local, not global, devices: under multi-host HPO each host trains its
    own ``partition_trials`` suggestion shard on its own chips — a global
    mesh would ask each host to device_put host-local arrays onto
    non-addressable devices. The shared policy for HyperparameterTuning
    and FineTuner rounds.
    """
    devices = jax.local_devices()
    n_dev = len(devices)
    if n_dev > 1 and n_trials % n_dev == 0:
        return Mesh(np.asarray(devices).reshape(n_dev), ("trial",))
    return None


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_leading_axis(tree, sharding: NamedSharding):
    """device_put every leaf with its leading axis sharded."""
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)
