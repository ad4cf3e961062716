"""Fine-tuning on held-out samples (transfer learning).

Capability parity with /root/reference/flexynesis/main.py:459-659 (FineTuner):
a grid over 3 learning rates {lr, lr/10, lr/100} x 3 freeze configurations
(freeze encoders / freeze supervisor heads / freeze nothing) x 5-fold CV on
the fine-tuning samples; the (lr, freeze) cell with the lowest average fold
val-loss wins and the model is re-trained on ALL fine-tuning samples with
that setting.

Freezing is expressed functionally: an optax.masked Adam that zeroes updates
for the frozen parameter subtrees (no deepcopy of modules — parameters are
immutable pytrees, so every fold just restarts from the trained params).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .trainer import Trainer, kfold_indices

FREEZE_CONFIGS: List[Dict[str, bool]] = [
    {"encoders": True, "supervisors": False},
    {"encoders": False, "supervisors": True},
    {"encoders": False, "supervisors": False},
]


def _make_mask_fn(freeze: Dict[str, bool]):
    """callable(params) -> bool pytree; True = trainable."""

    def is_trainable(path_key: str) -> bool:
        if freeze.get("encoders") and path_key.startswith("encoder"):
            return False
        if freeze.get("supervisors") and path_key.startswith("head_"):
            return False
        return True

    def mask(params):
        return {
            top: jax.tree.map(lambda _: is_trainable(top), sub)
            for top, sub in params.items()
        }

    return mask


class FineTuner:
    def __init__(
        self,
        model,
        dataset,
        n_splits: int = 5,
        max_epochs: int = 50,
        early_stop_patience: int = 3,
        seed: int = 42,
    ):
        self.model = model
        self.dataset = dataset
        self.n_splits = n_splits
        self.max_epochs = max_epochs
        self.early_stop_patience = early_stop_patience
        self.seed = seed
        base_lr = float(model.config["lr"])
        self.learning_rates = [base_lr, base_lr / 10, base_lr / 100]

    def _fit_once(
        self,
        lr: float,
        freeze: Dict[str, bool],
        train_idx,
        val_idx,
        max_epochs: Optional[int] = None,
    ) -> Tuple[float, object, object, int]:
        model = self.model
        params0 = jax.tree.map(jnp.copy, model.params)
        stats0 = jax.tree.map(jnp.copy, model.batch_stats)
        trainer = Trainer(
            model.loss_fn, lr=lr, trainable_mask=_make_mask_fn(freeze)
        )
        res = trainer.fit(
            params0,
            stats0,
            model.make_batch(self.dataset, train_idx),
            model.make_batch(self.dataset, val_idx) if val_idx is not None else None,
            n_samples=len(train_idx),
            batch_size=min(32, len(train_idx)),
            max_epochs=self.max_epochs if max_epochs is None else max_epochs,
            early_stop_patience=self.early_stop_patience,
            rng=jax.random.key(self.seed),
        )
        return res.val_loss, res.params, res.batch_stats, res.epochs_run

    def run_experiments(self, parallel: bool = True):
        """Grid-search (lr x freeze) with k-fold CV, then final full fit.

        With ``parallel=True`` (default) all lr x freeze x fold cells train
        CONCURRENTLY as one vmapped program — freeze configurations become
        per-trial 0/1 update masks, so 45 sequential Lightning fits
        (reference main.py:575-636) collapse into one jitted run. The CV
        sample count is trimmed to a multiple of k so folds have equal,
        vmappable shapes (at most k-1 samples sit out of CV; the final fit
        uses everything).
        """
        n = (
            self.model.n_train_samples(self.dataset)
            if hasattr(self.model, "n_train_samples")
            else len(self.dataset)
        )
        k = min(self.n_splits, max(n // 2, 2))

        if parallel:
            best = self._grid_parallel(n, k)
        else:
            best = self._grid_sequential(n, k)

        _, lr, freeze, final_epochs = best
        # the final full-data fit has no validation split, so no early
        # stopping can fire: cap it at the winning cell's CV-averaged
        # early-stop epoch count like the reference (main.py:647-659) —
        # grinding through all max_epochs would overfit the tiny
        # fine-tuning cohort the winner was selected on
        final_epochs = max(1, int(round(final_epochs)))
        print(
            f"[INFO] Final fine-tuning with lr={lr:.2g}, freeze={freeze}, "
            f"epochs={final_epochs}"
        )
        all_idx = np.arange(n)
        _, params, stats, _ = self._fit_once(
            lr, freeze, all_idx, None, max_epochs=final_epochs
        )
        self.model.params = params
        self.model.batch_stats = stats
        return self.model

    def _grid_sequential(self, n: int, k: int):
        folds = kfold_indices(n, k, seed=self.seed)
        best: Optional[Tuple[float, float, Dict[str, bool], float]] = None
        for lr in self.learning_rates:
            for freeze in FREEZE_CONFIGS:
                losses, epochs = [], []
                for tr, va in folds:
                    loss, _, _, n_ep = self._fit_once(lr, freeze, tr, va)
                    losses.append(loss)
                    epochs.append(n_ep)
                avg = float(np.mean(losses))
                avg_ep = float(np.mean(epochs))
                print(
                    f"[INFO] finetune lr={lr:.2g} freeze={freeze}: "
                    f"avg val loss {avg:.4f} (avg epochs {avg_ep:.1f})"
                )
                if best is None or avg < best[0]:
                    best = (avg, lr, freeze, avg_ep)
        return best

    def _grid_parallel(self, n: int, k: int):
        """All (lr, freeze, fold) cells as one vmapped training program."""
        from ..parallel.trials import equal_kfold_indices, vmapped_grid_fit

        model = self.model
        fold_train, fold_val = equal_kfold_indices(n, k, seed=self.seed)
        combos = [
            (lr, freeze)
            for lr in self.learning_rates
            for freeze in FREEZE_CONFIGS
        ]
        T = len(combos) * k
        lrs = np.asarray([lr for lr, _ in combos for _ in range(k)], np.float32)
        mask_trees = [
            _make_mask_fn(freeze)(model.params)
            for _, freeze in combos
            for _ in range(k)
        ]
        masks = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x, jnp.float32) for x in xs]),
            *mask_trees,
        )
        print(
            f"[INFO] Fine-tuning grid: {len(combos)} (lr x freeze) combos "
            f"x {k} folds = {T} concurrent vmapped fits"
        )
        # shard the grid over the local devices when it divides evenly
        # (shared policy: parallel.mesh.auto_trial_mesh)
        from ..parallel.mesh import auto_trial_mesh

        mesh = auto_trial_mesh(T)
        out = vmapped_grid_fit(
            model,
            self.dataset,
            start_params=model.params,
            start_stats=model.batch_stats,
            lrs=lrs,
            seeds=np.arange(self.seed, self.seed + T),
            train_idx=np.tile(fold_train, (len(combos), 1)),
            val_idx=np.tile(fold_val, (len(combos), 1)),
            masks=masks,
            batch_size=min(32, fold_train.shape[1]),
            max_epochs=self.max_epochs,
            early_stop_patience=self.early_stop_patience,
            mesh=mesh,
        )
        per_combo = out["best_val_loss"].reshape(len(combos), k).mean(axis=1)
        # early stopping in the vmapped program is global (all cells must
        # stall), so reconstruct each cell's individual stop epoch —
        # best_epoch + patience, capped at the epochs actually run — to
        # match the sequential path's Trainer epochs_run and the
        # reference's Lightning stopped_epoch (main.py:610-625)
        epochs_run = int(out["epochs_run"])
        stop_ep = np.asarray(out["best_epoch"], dtype=float)
        if self.early_stop_patience > 0:
            stop_ep = np.minimum(stop_ep + self.early_stop_patience, epochs_run)
        else:
            stop_ep = np.full_like(stop_ep, epochs_run)
        per_combo_ep = stop_ep.reshape(len(combos), k).mean(axis=1)
        for (lr, freeze), avg, avg_ep in zip(combos, per_combo, per_combo_ep):
            print(
                f"[INFO] finetune lr={lr:.2g} freeze={freeze}: "
                f"avg val loss {avg:.4f} (avg stop epoch {avg_ep:.1f})"
            )
        bi = int(np.argmin(per_combo))
        lr, freeze = combos[bi]
        return float(per_combo[bi]), lr, freeze, float(per_combo_ep[bi])
