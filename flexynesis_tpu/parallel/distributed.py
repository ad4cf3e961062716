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


def partition_trials(suggestions: List[dict]) -> List[dict]:
    """This process's shard of an HPO suggestion batch (round-robin by
    jax.process_index) — hosts then run their shard on local devices and the
    GP `tell`s merge on the coordinating host."""
    pi, pc = jax.process_index(), jax.process_count()
    return [s for i, s in enumerate(suggestions) if i % pc == pi]
