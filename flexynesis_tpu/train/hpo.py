"""Hyperparameter optimization engine.

Capability parity with /root/reference/flexynesis/main.py (HyperparameterTuning,
main.py:28-456): GP Bayesian optimization with 10 initial points, per-trial
training with a val split or k-fold CV, HPO-level patience, YAML search-space
override, dataset-size-derived batch-size space (main.py:183-190), and a
final full-data retrain when CV is used (main.py:406-416).

TPU-first changes:
* the skopt GP is replaced by the native batched-ask optimizer (gp.py);
  ``batch_ask > 1`` evaluates several suggestions per round — the hook for
  fanning trials out across a device mesh (parallel/trials.py);
* trials run through the jit-compiled Trainer — quantized search dimensions
  (config.py) make consecutive trials reuse compiled executables;
* HPO state (observations + RNG + best) checkpoints to JSON every iteration,
  making long sweeps preemption-safe (the reference has no mid-run resume —
  SURVEY.md §5.3/§5.4).
"""

from __future__ import annotations

import json
import os
import time
from typing import List, Optional

import numpy as np

from ..config import get_search_space
from .gp import BayesianOptimizer
from .space import Categorical, SearchSpace, load_and_convert_config
from .trainer import kfold_indices, train_val_split


class HyperparameterTuning:
    def __init__(
        self,
        dataset,
        model_class,
        config_name: str,
        target_variables: List[str],
        batch_variables: Optional[List[str]] = None,
        surv_event_var: Optional[str] = None,
        surv_time_var: Optional[str] = None,
        n_iter: int = 10,
        config_path: Optional[str] = None,
        plot_losses: bool = False,
        val_size: float = 0.2,
        use_cv: bool = False,
        cv_splits: int = 5,
        use_loss_weighting: bool = True,
        early_stop_patience: int = -1,
        device_type: Optional[str] = None,
        gnn_conv_type: Optional[str] = None,
        input_layers=None,
        output_layers=None,
        num_workers: int = 0,
        checkpoint_path: Optional[str] = None,
        batch_ask: int = 1,
        seed: int = 42,
        mesh=None,
        pipeline_ask: bool = True,
    ):
        self.dataset = dataset
        self.model_class = model_class
        self.config_name = config_name
        self.target_variables = target_variables
        self.batch_variables = batch_variables
        self.surv_event_var = surv_event_var
        self.surv_time_var = surv_time_var
        self.n_iter = n_iter
        self.plot_losses = plot_losses
        self.val_size = val_size
        self.use_cv = use_cv
        self.n_splits = cv_splits
        self.use_loss_weighting = use_loss_weighting
        self.early_stop_patience = early_stop_patience
        self.device_type = device_type
        self.gnn_conv_type = gnn_conv_type
        self.input_layers = input_layers
        self.output_layers = output_layers
        self.checkpoint_path = checkpoint_path
        self.batch_ask = max(int(batch_ask), 1)
        # pipeline_ask: with batched rounds, compute round N+1's GP
        # suggestions (conditioned on round N as constant-liar pending —
        # gp.AskSession) in the host gaps while round N trains on device,
        # so Bayesian-optimizer time hides under device time instead of
        # serializing with it
        self.pipeline_ask = bool(pipeline_ask)
        self._host_work = None
        self.seed = seed
        # explicit mesh, or None -> auto-build a trial mesh per round when
        # multiple devices are visible (_trial_mesh)
        self.mesh = mesh
        # template models and ParallelTrials engines reused across GP
        # rounds: quantized search dims make consecutive rounds share
        # architecture shapes, and reusing the SAME template object lets
        # the jitted trial engines hit their caches instead of re-tracing
        # (and, on the real TPU tunnel, re-compiling ~110s) every round
        self._templates: dict = {}
        self._pts: dict = {}
        # CV folds of a trial train concurrently (vmapped) by default —
        # SURVEY §2.3 item 3; set False to reproduce sequential fold fits
        self.parallel_folds = True

        # the triplet model trains over anchors (samples with a non-missing
        # first target label) — splits and batch space follow that count,
        # like the reference's loader_dataset switch (main.py:159-162)
        if model_class.__name__ == "MultiTripletNetwork":
            import numpy as _np

            labels = _np.asarray(dataset.ann[target_variables[0]], dtype=float)
            self.n_units = int((_np.isfinite(labels) & (labels != -1)).sum())
        else:
            self.n_units = len(dataset)

        if config_path:
            external = load_and_convert_config(config_path)
            if self.config_name not in external:
                raise ValueError(
                    f"'{self.config_name}' not found in the provided config file."
                )
            self.space: SearchSpace = external[self.config_name]
        else:
            self.space = get_search_space(self.config_name)
            self.space.append(self.get_batch_space())

    def get_batch_space(self, min_size: int = 32, max_size: int = 128) -> Categorical:
        """Power-of-two batch sizes capped by log2(0.8 * n) (main.py:183-190)."""
        m = int(np.log2(self.n_units * 0.8))
        st = int(np.log2(min_size))
        end = min(int(np.log2(max_size)), m)
        sizes = [int(2**x) for x in range(st, end + 1)] or [min_size]
        return Categorical(sizes, name="batch_size")

    # ------------------------------------------------------------- objective

    def _model_args(self, params: dict) -> dict:
        args = {
            "config": params,
            "dataset": self.dataset,
            "target_variables": self.target_variables,
            "batch_variables": self.batch_variables,
            "surv_event_var": self.surv_event_var,
            "surv_time_var": self.surv_time_var,
            "use_loss_weighting": self.use_loss_weighting,
            "device_type": self.device_type,
        }
        if self.model_class.__name__ == "GNN":
            args["gnn_conv_type"] = self.gnn_conv_type
        if self.model_class.__name__ == "CrossModalPred":
            args["input_layers"] = self.input_layers
            args["output_layers"] = self.output_layers
        return args

    def _template_key(self, params: dict) -> tuple:
        return tuple((k, params[k]) for k in sorted(params) if k != "lr")

    def _get_template(self, params: dict):
        """Model template for an architecture, cached across GP rounds."""
        key = self._template_key(params)
        if key not in self._templates:
            self._templates[key] = self.model_class(**self._model_args(params))
        return self._templates[key]

    def _trial_mesh(self, n_trials: int):
        """Trial-axis mesh for an n_trials round, or None.

        The reference never distributes (SURVEY §2.3/§5.8); here every
        parallel round shards its stacked trial axis over this process's
        local devices whenever the trial count divides evenly — so a
        v5e-8 slice trains 8 shards of a round concurrently with zero flag
        changes (parallel.mesh.auto_trial_mesh). An explicit ``mesh=``
        passed to __init__ wins; single-device processes and non-divisible
        rounds run unsharded (plain vmap).
        """
        if self.mesh is not None:
            n_dev = int(np.prod(self.mesh.devices.shape))
            return self.mesh if n_trials % n_dev == 0 else None
        from ..parallel.mesh import auto_trial_mesh

        return auto_trial_mesh(n_trials)

    def objective(self, params: dict, full_train: bool = False):
        """Train with ``params``; returns (avg_val_loss, avg_epochs, model),
        or just the trained model when full_train=True (main.py:228-332)."""
        n = self.n_units
        if full_train:
            model = self.model_class(**self._model_args(params))
            model.fit(
                self.dataset,
                lr=params["lr"],
                batch_size=int(params["batch_size"]),
                max_epochs=int(params["epochs"]),
                early_stop_patience=-1,
                seed=self.seed,
            )
            return model

        if self.use_cv:
            if self.parallel_folds:
                return self._objective_cv_parallel(params, n)
            splits = kfold_indices(n, self.n_splits, seed=self.seed)
        else:
            splits = [train_val_split(n, self.val_size, seed=self.seed)]

        losses, epochs = [], []
        model = None
        for train_idx, val_idx in splits:
            model = self.model_class(**self._model_args(params))
            on_epoch_end = None
            if self.plot_losses:
                from .live_plot import LiveLossPlot

                plot = LiveLossPlot(hyperparams=params)
                on_epoch_end = plot.update
            res = model.fit(
                self.dataset,
                train_idx,
                val_idx,
                lr=params["lr"],
                batch_size=int(params["batch_size"]),
                max_epochs=int(params["epochs"]),
                early_stop_patience=self.early_stop_patience,
                seed=self.seed,
                on_epoch_end=on_epoch_end,
            )
            losses.append(res.val_loss)
            epochs.append(res.epochs_run)
        return float(np.mean(losses)), int(np.mean(epochs)), model

    def _objective_cv_parallel(self, params: dict, n: int):
        """All k CV folds of one suggestion train concurrently (vmapped).

        Fold sizes are equalized by trimming n % k samples from CV (the
        final full-data retrain still uses every sample).
        """
        from ..parallel.trials import equal_kfold_indices, vmapped_grid_fit

        k = self.n_splits
        tr, va = equal_kfold_indices(n, k, seed=self.seed)
        model = self._get_template(params)
        out = vmapped_grid_fit(
            model,
            self.dataset,
            start_params=None,
            start_stats=None,
            lrs=np.full(k, float(params["lr"]), np.float32),
            seeds=np.arange(self.seed, self.seed + k),
            train_idx=tr,
            val_idx=va,
            batch_size=int(params["batch_size"]),
            max_epochs=int(params["epochs"]),
            early_stop_patience=self.early_stop_patience,
            # fresh-init trials use the SR-bf16 engine like every other
            # parallel round (deterministic hash-based rounding, so the
            # fused-CV path stays bit-comparable — ops/sr_adam.py)
            param_dtype="bfloat16_sr",
            mesh=self._trial_mesh(k),
        )
        avg_loss = float(np.mean(out["best_val_loss"]))
        avg_epochs = int(np.mean(out["best_epoch"]))
        print(
            f"[INFO] {k}-fold CV (vmapped, concurrent): "
            f"avg val loss {avg_loss:.4f}"
        )
        return avg_loss, avg_epochs, None

    # -------------------------------------------------------------- tuning

    def _save_checkpoint(self, opt, best_params, best_loss, iteration):
        if not self.checkpoint_path:
            return
        state = {
            "optimizer": opt.state_dict(),
            "best_params": best_params,
            "best_loss": best_loss,
            "best_epochs": self._best_epochs,
            "iteration": iteration,
            "config_name": self.config_name,
        }
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(state, fh)
        os.replace(tmp, self.checkpoint_path)

    def _load_checkpoint(self, opt):
        if self.checkpoint_path and os.path.exists(self.checkpoint_path):
            with open(self.checkpoint_path) as fh:
                state = json.load(fh)
            if state.get("config_name") == self.config_name:
                opt.load_state_dict(state["optimizer"])
                print(
                    f"[INFO] Resuming HPO from iteration {state['iteration']} "
                    f"(best loss {state['best_loss']})"
                )
                return state
        return None

    # model families whose parameters can be padded to a common max shape
    # (parallel/hetero.py) so even different-dim suggestions stack under vmap
    PADDABLE_MODELS = (
        "DirectPred",
        "MultiTripletNetwork",
        "supervised_vae",
        "CrossModalPred",
        "GNN",
    )

    def _bucket_by_architecture(self, suggestions):
        """Group suggestions that can train in one vmapped program.

        For paddable model families only structurally un-paddable settings
        must match (hetero.bucket_key: epochs/batch for all, plus conv count/
        activation/readout for the GNN) — architecture dims pad to the
        group's max (parallel/hetero.py). Other models group on full
        architecture identity, with lr free (a vmapped scalar).
        """
        from ..parallel.hetero import bucket_key

        name = self.model_class.__name__
        paddable = name in self.PADDABLE_MODELS
        buckets: dict = {}
        for params in suggestions:
            if paddable:
                key = bucket_key(name, params)
            else:
                key = tuple(
                    (k, params[k]) for k in sorted(params) if k != "lr"
                )
            buckets.setdefault(key, []).append(params)
        return list(buckets.values())

    def _arch_identical(self, group) -> bool:
        keys = [
            tuple((k, p[k]) for k in sorted(p) if k != "lr") for p in group
        ]
        return len(set(keys)) == 1

    def _run_parallel_group_hetero(self, group):
        """Mixed-architecture group: pad params to the max dims and train all
        suggestions as one vmapped program with per-trial element masks."""
        from ..parallel.hetero import build_padded_trials, max_config
        from ..parallel.trials import vmapped_grid_fit

        n = self.n_units
        train_idx, val_idx = train_val_split(n, self.val_size, seed=self.seed)
        template_cfg = dict(group[0])
        template_cfg.update(
            max_config(group, [
                len(self.dataset.features[k]) for k in self.dataset.dat.keys()
            ])
        )
        template = self._get_template(template_cfg)
        seeds = np.arange(self.seed, self.seed + len(group))
        trials = build_padded_trials(template, group, seeds)
        print(
            f"[INFO] Training {len(group)} mixed-architecture trials "
            "concurrently (padded vmap)"
        )
        out = vmapped_grid_fit(
            template,
            self.dataset,
            start_params=trials["params"],
            start_stats=trials["batch_stats"],
            lrs=np.asarray([p["lr"] for p in group], np.float32),
            seeds=seeds,
            train_idx=np.tile(train_idx, (len(group), 1)),
            val_idx=np.tile(val_idx, (len(group), 1)),
            masks=trials["masks"],
            aux=trials.get("aux"),
            batch_size=int(group[0]["batch_size"]),
            max_epochs=int(group[0]["epochs"]),
            early_stop_patience=self.early_stop_patience,
            mesh=self._trial_mesh(len(group)),
            # fresh-init rounds: stochastically-rounded bf16 params are
            # convergence-equivalent and ~1.3x faster (ops/sr_adam.py);
            # warm-started fits (fine-tuner) keep float32
            param_dtype="bfloat16_sr",
            host_work=self._host_work,
        )
        return [
            (float(out["best_val_loss"][k]), int(out["best_epoch"][k]), None)
            for k in range(len(group))
        ]

    def _run_parallel_group_cv(self, group):
        """CV x batched-ask fusion: K suggestions x k folds train as ONE
        vmapped program of K*k trials.

        The reference's CV objective (main.py:267-332) is its most expensive
        mode — k sequential fold fits per suggestion, suggestions sequential.
        Here every (suggestion, fold) cell becomes one trial on the vmapped
        trial axis: per-trial splits come from ``equal_kfold_indices`` tiled
        across suggestions, per-trial lrs repeat each suggestion's lr across
        its folds, and mixed-architecture groups pad to max dims with
        per-trial masks exactly like the non-CV hetero path. Per-suggestion
        scores are fold-means, matching the sequential path.
        """
        from ..parallel.trials import equal_kfold_indices, vmapped_grid_fit

        n = self.n_units
        k = self.n_splits
        K = len(group)
        tr, va = equal_kfold_indices(n, k, seed=self.seed)
        train_idx = np.tile(tr, (K, 1))
        val_idx = np.tile(va, (K, 1))
        lrs = np.repeat(np.asarray([p["lr"] for p in group], np.float32), k)
        # same per-fold seeds for every suggestion — identical to running
        # _objective_cv_parallel once per suggestion
        seeds = np.tile(np.arange(self.seed, self.seed + k), K)

        if self._arch_identical(group):
            template = self._get_template(group[0])
            trials: dict = {}
        else:
            from ..parallel.hetero import build_padded_trials, max_config

            template_cfg = dict(group[0])
            template_cfg.update(
                max_config(group, [
                    len(self.dataset.features[key])
                    for key in self.dataset.dat.keys()
                ])
            )
            template = self._get_template(template_cfg)
            # each suggestion's padded params/masks repeat across its folds
            expanded = [p for p in group for _ in range(k)]
            trials = build_padded_trials(template, expanded, seeds)

        print(
            f"[INFO] Training {K} suggestions x {k} CV folds = {K * k} "
            "trials concurrently (vmapped)"
        )
        out = vmapped_grid_fit(
            template,
            self.dataset,
            start_params=trials.get("params"),
            start_stats=trials.get("batch_stats"),
            lrs=lrs,
            seeds=seeds,
            train_idx=train_idx,
            val_idx=val_idx,
            masks=trials.get("masks"),
            aux=trials.get("aux"),
            batch_size=int(group[0]["batch_size"]),
            max_epochs=int(group[0]["epochs"]),
            early_stop_patience=self.early_stop_patience,
            param_dtype="bfloat16_sr",
            mesh=self._trial_mesh(K * k),
            host_work=self._host_work,
        )
        loss = np.asarray(out["best_val_loss"]).reshape(K, k).mean(axis=1)
        ep = np.asarray(out["best_epoch"]).reshape(K, k).mean(axis=1)
        return [(float(loss[i]), int(round(ep[i])), None) for i in range(K)]

    def _run_parallel_group(self, group):
        """Train a same-architecture suggestion group via vmapped trials."""
        from ..parallel.trials import ParallelTrials

        n = self.n_units
        train_idx, val_idx = train_val_split(n, self.val_size, seed=self.seed)
        template = self._get_template(group[0])
        mesh = self._trial_mesh(len(group))
        pkey = (
            self._template_key(group[0]),
            0 if mesh is None else int(np.prod(mesh.devices.shape)),
        )
        pt = self._pts.get(pkey)
        if pt is None:
            pt = ParallelTrials(template, self.dataset, mesh=mesh)
            self._pts[pkey] = pt
        lrs = np.asarray([p["lr"] for p in group], np.float32)
        seeds = np.full(len(group), self.seed, np.int64)
        print(
            f"[INFO] Training {len(group)} same-architecture trials "
            "concurrently (vmapped)"
        )
        # preemption safety inside a round: the stacked trial state
        # checkpoints per chunk next to the JSON HPO state. Each group gets
        # its own directory (keyed by its suggestions) so replaying earlier
        # groups after a restart cannot clobber the preempted group's state.
        ckpt_dir = None
        if self.checkpoint_path:
            import hashlib
            import json as _json

            digest = hashlib.sha256(
                _json.dumps(group, sort_keys=True, default=str).encode()
            ).hexdigest()[:12]
            ckpt_dir = f"{self.checkpoint_path}.round-{digest}"
        out = pt.run(
            lrs=lrs,
            seeds=seeds,
            train_idx=train_idx,
            val_idx=val_idx,
            batch_size=int(group[0]["batch_size"]),
            max_epochs=int(group[0]["epochs"]),
            early_stop_patience=self.early_stop_patience,
            checkpoint_dir=ckpt_dir,
            host_work=self._host_work,
        )
        if ckpt_dir is not None:
            import shutil

            shutil.rmtree(ckpt_dir, ignore_errors=True)
        # models are not retained per-trial; the best config retrains at the
        # end of perform_tuning (full_train path)
        return [
            (float(out["best_val_loss"][k]), int(out["best_epoch"][k]), None)
            for k in range(len(group))
        ]

    def perform_tuning(self, hpo_patience: int = 0):
        opt = BayesianOptimizer(self.space, n_initial_points=10, seed=self.seed)
        best_loss = np.inf
        best_params = None
        best_epochs = 0
        best_model = None
        no_improvement = 0
        start_iter = 0

        self._best_epochs = 0
        resume = self._load_checkpoint(opt)
        if resume is not None:
            best_loss = resume["best_loss"]
            best_params = resume["best_params"]
            best_epochs = resume.get("best_epochs", 0)
            self._best_epochs = best_epochs
            start_iter = resume["iteration"]

        i = start_iter
        pipeline = self.pipeline_ask and self.batch_ask > 1
        suggestions = (
            opt.ask(min(self.batch_ask, self.n_iter - i))
            if i < self.n_iter else []
        )
        while suggestions:
            groups = list(self._bucket_by_architecture(suggestions))
            # pipelined ask: start the NEXT round's session now, with this
            # round's suggestions as constant-liar pending; the trial
            # engines drain it via host_work while the device trains.
            # Only worth it if at least one group takes a parallel-engine
            # path that actually drains host_work — otherwise the session
            # would pay constant-liar staleness (vs conditioning on this
            # round's real losses) while hiding zero ask time
            q_next = min(self.batch_ask, self.n_iter - i - len(suggestions))
            drains = any(len(g) > 1 for g in groups) and (
                not self.use_cv or self.parallel_folds
            )
            session = (
                opt.ask_session(q_next, pending=suggestions)
                if pipeline and drains and q_next > 0 else None
            )
            self._host_work = session.work if session is not None else None
            # same-architecture suggestions train CONCURRENTLY (vmapped over
            # the trial axis, parallel/trials.py); lr varies freely per trial
            for group in groups:
                t0 = time.perf_counter()
                if len(group) > 1 and self.use_cv and self.parallel_folds:
                    # suggestions x folds fuse into one K*k-trial program
                    results = self._run_parallel_group_cv(group)
                elif len(group) > 1 and not self.use_cv:
                    if self._arch_identical(group):
                        results = self._run_parallel_group(group)
                    else:
                        results = self._run_parallel_group_hetero(group)
                else:
                    results = None
                for gi, params in enumerate(group):
                    if results is not None:
                        loss, avg_epochs, model = results[gi]
                    else:
                        loss, avg_epochs, model = self.objective(params)
                    opt.tell(params, loss)
                    i += 1
                    if loss < best_loss:
                        best_loss = loss
                        best_params = dict(params)
                        best_epochs = avg_epochs
                        self._best_epochs = avg_epochs
                        best_model = model
                        no_improvement = 0
                    else:
                        no_improvement += 1
                    print(
                        f"[INFO] HPO iter {i}/{self.n_iter}: loss={loss:.4f} "
                        f"best={best_loss:.4f} "
                        f"({time.perf_counter() - t0:.1f}s cum. for group) "
                        f"params={params}"
                    )
                    self._save_checkpoint(opt, best_params, float(best_loss), i)
            self._host_work = None
            if hpo_patience > 0 and no_improvement >= hpo_patience:
                print(
                    f"[INFO] No improvement for {hpo_patience} HPO iterations — "
                    "stopping early."
                )
                break
            if session is not None:
                # any ask work not already hidden under the device round
                suggestions = session.finish()
            elif i < self.n_iter:
                suggestions = opt.ask(min(self.batch_ask, self.n_iter - i))
            else:
                suggestions = []

        best_params = dict(best_params)
        best_params["epochs"] = max(best_epochs, 1)

        if self.use_cv or best_model is None:
            # CV keeps no single model; a fully-resumed run has none either —
            # retrain on the full dataset with the best parameters
            print(f"[INFO] Final full-data training with best params: {best_params}")
            best_model = self.objective(best_params, full_train=True)

        return best_model, best_params
