"""Orbax checkpointing of training state (preemption-safe mid-training resume).

The reference disables checkpointing during training entirely
(enable_checkpointing=False, main.py:222/601/656; SURVEY.md §5.4). Here the
full train state — params, optimizer state, batch_stats, RNG key and epoch
counter — checkpoints atomically through orbax at a configurable cadence, and
``Trainer.fit(checkpoint_dir=...)`` resumes from the latest step after a
preemption. HPO-level state checkpoints separately as JSON (train/hpo.py).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


class TrainCheckpointer:
    def __init__(self, directory: str, every_n_epochs: int = 10, max_to_keep: int = 2):
        import orbax.checkpoint as ocp

        self.directory = os.path.abspath(directory)
        self.every_n_epochs = max(int(every_n_epochs), 1)
        os.makedirs(self.directory, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def maybe_save(self, epoch: int, params, opt_state, batch_stats, rng,
                   best_val: float) -> None:
        if epoch % self.every_n_epochs != 0:
            return
        self.save(epoch, params, opt_state, batch_stats, rng, best_val)

    def save(self, epoch: int, params, opt_state, batch_stats, rng,
             best_val: float) -> None:
        import orbax.checkpoint as ocp

        state = {
            "params": params,
            "opt_state": opt_state,
            "batch_stats": batch_stats,
            "rng": jax.random.key_data(rng),
            "meta": {
                "epoch": np.asarray(epoch),
                "best_val": np.asarray(best_val, np.float64),
            },
        }
        self.manager.save(epoch, args=ocp.args.StandardSave(state))
        # the caller donates these buffers into the next train epoch —
        # serialization must complete before they are invalidated
        self.manager.wait_until_finished()

    def restore(self, template: Optional[dict] = None):
        """Latest checkpoint as a dict, or None when no checkpoint exists."""
        import orbax.checkpoint as ocp

        step = self.manager.latest_step()
        if step is None:
            return None
        if template is not None:
            state = self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            state = self.manager.restore(step)
        state["rng"] = jax.random.wrap_key_data(np.asarray(state["rng"]))
        state["meta"]["epoch"] = int(np.asarray(state["meta"]["epoch"]))
        state["meta"]["best_val"] = float(np.asarray(state["meta"]["best_val"]))
        return state

    def close(self) -> None:
        self.manager.close()
