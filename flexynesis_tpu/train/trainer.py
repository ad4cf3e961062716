"""Jit-compiled training loop — the framework's replacement for the
reference's PyTorch-Lightning runtime (main.py:192-225 setup_trainer).

Design (TPU-first, see SURVEY.md §7.1):

* The whole dataset lives on device as dict-of-(N, F) float32 arrays; a
  "batch" is a static-shape gather by a permutation slice, so one compiled
  program serves every epoch (no DataLoader, no host-device churn).
* One epoch = ``lax.scan`` over ``train_step`` across the shuffled batch
  index table; epochs advance in a thin Python loop that only reads back a
  scalar val_loss for early stopping (reference main.py:420-427 semantics:
  monitor val_loss, mode min, patience from --early_stop_patience).
* Optimizer: Adam(lr) + global-norm grad clipping 1.0, matching
  reference main.py:216-217 / direct_pred.py:135-144.
* Optional data-parallel sharding: pass a Mesh and batches are sharded over
  the 'data' axis while parameters are replicated (XLA inserts the psum).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from functools import partial
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax


@dataclass
class TrainResult:
    params: Any
    batch_stats: Any
    val_loss: float
    epochs_run: int
    history: Dict[str, list] = field(default_factory=dict)
    wall_time_s: float = 0.0


class EarlyStopper:
    """val_loss early stopping: Lightning EarlyStopping(mode="min") semantics."""

    def __init__(self, patience: int, min_delta: float = 0.0):
        self.patience = patience
        self.min_delta = min_delta
        self.best = float("inf")
        self.count = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        if self.patience is None or self.patience < 0:
            return False
        if value < self.best - self.min_delta:
            self.best = value
            self.count = 0
            return False
        self.count += 1
        return self.count >= self.patience


def make_optimizer(
    lr: float, grad_clip: float = 1.0, trainable_mask=None
) -> optax.GradientTransformation:
    """Adam + global-norm clipping; optionally freeze params via a mask.

    ``trainable_mask``: callable(params) -> pytree of bool (True = train).
    Used by the fine-tuner's freeze configurations (reference main.py:530-539).
    """
    adam = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if trainable_mask is None:
        return optax.chain(optax.clip_by_global_norm(grad_clip), adam)
    # the whole chain sits inside optax.masked so the global-norm clip sees
    # only TRAINABLE gradients — the reference (Lightning) clips parameters
    # with requires_grad only, so frozen encoders must not inflate the norm
    # and shrink the effective update on the trainable heads
    return optax.masked(
        optax.chain(optax.clip_by_global_norm(grad_clip), adam),
        trainable_mask,
    )


class Trainer:
    """Owns the jitted train/val step for a model's pure loss function.

    ``loss_fn(params, batch_stats, batch, rng, train)`` must return
    ``(total_loss, (losses_dict, new_batch_stats))`` — models provide this.
    """

    def __init__(
        self,
        loss_fn: Callable,
        lr: float,
        grad_clip: float = 1.0,
        mesh: Optional[jax.sharding.Mesh] = None,
        trainable_mask=None,
    ):
        self.loss_fn = loss_fn
        self.optimizer = make_optimizer(lr, grad_clip, trainable_mask)
        self.mesh = mesh
        self._train_epoch = None
        self._val_step = None

    # ------------------------------------------------------------ internals

    def _build(self):
        loss_fn = self.loss_fn
        optimizer = self.optimizer

        def train_step(carry, batch_idx, data):
            params, opt_state, batch_stats, rng = carry
            rng, step_rng = jax.random.split(rng)
            # top-level keys starting with '_' are broadcast whole into every
            # batch (e.g. the full matrices the triplet sampler gathers from)
            batch = {
                k: (v if k.startswith("_") else jax.tree.map(lambda a: a[batch_idx], v))
                for k, v in data.items()
            }

            def wrapped(p):
                return loss_fn(p, batch_stats, batch, step_rng, True)

            (loss, (_, new_stats)), grads = jax.value_and_grad(
                wrapped, has_aux=True
            )(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, new_stats, rng), loss

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_epoch(params, opt_state, batch_stats, rng, perm, data):
            (params, opt_state, batch_stats, rng), losses = jax.lax.scan(
                lambda c, i: train_step(c, i, data),
                (params, opt_state, batch_stats, rng),
                perm,
            )
            return params, opt_state, batch_stats, rng, jnp.mean(losses)

        @jax.jit
        def val_step(params, batch_stats, batch):
            _, (losses, _) = loss_fn(params, batch_stats, batch, None, False)
            total = sum(losses.values())
            return total, losses

        self._train_epoch = train_epoch
        self._val_step = val_step

    # ---------------------------------------------------------------- fit

    def fit(
        self,
        params,
        batch_stats,
        train_data: Dict[str, Any],
        val_data: Optional[Dict[str, Any]],
        *,
        n_samples: int,
        batch_size: int,
        max_epochs: int,
        early_stop_patience: int = -1,
        rng: Optional[jax.Array] = None,
        log_every: int = 0,
        checkpoint_dir: Optional[str] = None,
        checkpoint_every: int = 10,
        on_epoch_end=None,
    ) -> TrainResult:
        """Train; returns best-by-val-loss parameters when val_data is given.

        ``train_data``/``val_data`` are pytrees whose leaves all have a
        leading sample axis (model inputs AND labels together).
        """
        if self._train_epoch is None:
            self._build()
        rng = rng if rng is not None else jax.random.key(0)

        if self.mesh is not None:
            # data-parallel layout: sample axes sharded over the 'data' mesh
            # axis, parameters replicated — XLA inserts the gradient psum
            from jax.sharding import NamedSharding, PartitionSpec as P

            shard = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())

            n_dev = self.mesh.shape["data"]

            def shard_rows(tree):
                # shard only sample axes divisible by the mesh; replicate rest
                return jax.tree.map(
                    lambda a: jax.device_put(
                        a,
                        shard
                        if hasattr(a, "ndim")
                        and a.ndim >= 1
                        and a.shape[0] % n_dev == 0
                        else repl,
                    ),
                    tree,
                )

            train_data = {
                k: (v if k.startswith("_") else shard_rows(v))
                for k, v in train_data.items()
            }
            if val_data is not None:
                val_data = {
                    k: (v if k.startswith("_") else shard_rows(v))
                    for k, v in val_data.items()
                }
            params = jax.device_put(params, repl)
            batch_stats = jax.tree.map(
                lambda a: jax.device_put(a, repl), batch_stats
            )

        batch_size = min(batch_size, n_samples)
        n_batches = max(n_samples // batch_size, 1)

        opt_state = self.optimizer.init(params)
        stopper = EarlyStopper(early_stop_patience)
        best_val = float("inf")
        best = (params, batch_stats)
        history = {"train_loss": [], "val_loss": []}

        ckpt = None
        start_epoch = 0
        if checkpoint_dir:
            from .checkpoint import TrainCheckpointer

            ckpt = TrainCheckpointer(checkpoint_dir, checkpoint_every)
            template = {
                "params": params,
                "opt_state": opt_state,
                "batch_stats": batch_stats,
                "rng": jax.random.key_data(rng),
                "meta": {
                    "epoch": np.asarray(0),
                    "best_val": np.asarray(0.0, np.float64),
                },
            }
            restored = ckpt.restore(template)
            if restored is not None:
                params = restored["params"]
                opt_state = restored["opt_state"]
                batch_stats = restored["batch_stats"]
                rng = restored["rng"]
                start_epoch = restored["meta"]["epoch"]
                hist_best = float(restored["meta"]["best_val"])
                # best-so-far PARAMS are not checkpointed (only the live
                # train state is), so the historical best_val may belong to
                # params we no longer have. Restart best tracking from the
                # restore point: the returned params then always ACHIEVE
                # the reported val_loss.
                best_val = float("inf")
                best = jax.tree.map(jnp.copy, (params, batch_stats))
                print(
                    f"[INFO] Resumed training from epoch {start_epoch} "
                    f"(pre-preemption best val {hist_best:.4f})"
                )

        t0 = time.perf_counter()
        epochs_run = start_epoch
        for epoch in range(start_epoch, max_epochs):
            rng, perm_rng = jax.random.split(rng)
            perm = jax.random.permutation(perm_rng, n_samples)[
                : n_batches * batch_size
            ].reshape(n_batches, batch_size)
            params, opt_state, batch_stats, rng, train_loss = self._train_epoch(
                params, opt_state, batch_stats, rng, perm, train_data
            )
            epochs_run = epoch + 1

            if val_data is not None:
                val_loss, _ = self._val_step(params, batch_stats, val_data)
                val_loss = float(val_loss)
                history["val_loss"].append(val_loss)
                if val_loss < best_val:
                    best_val = val_loss
                    # deep-copy: the live buffers are donated to the next epoch
                    best = jax.tree.map(jnp.copy, (params, batch_stats))
                if log_every and (epoch % log_every == 0):
                    print(
                        f"[epoch {epoch}] train_loss={float(train_loss):.4f} "
                        f"val_loss={val_loss:.4f}"
                    )
                if on_epoch_end is not None:
                    on_epoch_end(epoch, float(train_loss), val_loss)
                if ckpt is not None:
                    ckpt.maybe_save(
                        epoch + 1, params, opt_state, batch_stats, rng, best_val
                    )
                if stopper.update(val_loss):
                    break
            else:
                history["train_loss"].append(float(train_loss))
                if ckpt is not None:
                    ckpt.maybe_save(
                        epoch + 1, params, opt_state, batch_stats, rng,
                        float(train_loss),
                    )
                if log_every and (epoch % log_every == 0):
                    print(f"[epoch {epoch}] train_loss={float(train_loss):.4f}")

        if ckpt is not None:
            ckpt.close()
        if val_data is None:
            best = (params, batch_stats)
            best_val = float(history["train_loss"][-1]) if history["train_loss"] else 0.0
        elif not np.isfinite(best_val):
            # resumed at (or past) max_epochs: no epoch ran after restore,
            # so score the restored params directly
            best_val = float(self._val_step(params, batch_stats, val_data)[0])
            best = (params, batch_stats)

        return TrainResult(
            params=best[0],
            batch_stats=best[1],
            val_loss=best_val,
            epochs_run=epochs_run,
            history=history,
            wall_time_s=time.perf_counter() - t0,
        )

    def validate(self, params, batch_stats, data) -> float:
        if self._val_step is None:
            self._build()
        loss, _ = self._val_step(params, batch_stats, data)
        return float(loss)


def train_val_split(
    n: int, val_size: float, seed: int = 42
) -> tuple[np.ndarray, np.ndarray]:
    """Random train/val split of sample indices (reference main.py:267-280)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    n_val = int(np.ceil(n * val_size))
    return perm[n_val:], perm[:n_val]


def kfold_indices(n: int, k: int = 5, seed: int = 42):
    """K-fold splits of sample indices (reference main.py:267-280 CV branch)."""
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    folds = np.array_split(perm, k)
    out = []
    for i in range(k):
        val = folds[i]
        train = np.concatenate([folds[j] for j in range(k) if j != i])
        out.append((train, val))
    return out
