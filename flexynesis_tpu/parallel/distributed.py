"""Multi-host execution helpers.

The reference has no distributed backend (SURVEY.md §5.8 — devices=1
everywhere). Here multi-host scaling goes through jax.distributed + XLA
collectives: ``initialize()`` wires the process group (ICI within a slice,
DCN across slices — coordinates come from the TPU environment or explicit
args), and ``partition_trials`` splits an HPO suggestion batch across hosts
so each process trains its shard of trials on its local devices.
"""

from __future__ import annotations

from typing import List, Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize jax.distributed (no-op for single-process runs).

    With no arguments, cloud TPU environments auto-discover the topology.
    Returns a summary dict {process_index, process_count, local_devices,
    global_devices}.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def partition_trials(
    suggestions: List[dict],
    process_index: Optional[int] = None,
    process_count: Optional[int] = None,
) -> List[dict]:
    """This process's shard of an HPO suggestion batch (round-robin by
    jax.process_index) — hosts then run their shard on local devices and the
    GP `tell`s merge on the coordinating host.

    ``process_index``/``process_count`` default to the live jax topology;
    they are explicit parameters so the shard arithmetic is unit-testable
    without a multi-host cluster. Round-robin guarantees: shards are
    disjoint, their union is the full batch in order, sizes differ by at
    most 1, and when K < hosts the trailing hosts get empty shards.
    """
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    if not 0 <= pi < pc:
        raise ValueError(f"process_index {pi} out of range for {pc} hosts")
    return [s for i, s in enumerate(suggestions) if i % pc == pi]
