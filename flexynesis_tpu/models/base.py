"""Shared model scaffolding: the functional replacement for the reference's
LightningModule base behavior (predict/transform/feature-importance surface on
every model — e.g. direct_pred.py:296-590).

A model = a Flax module (pure function) + host-side orchestration object
(`BaseModel`) holding config, dataset metadata, params and batch_stats. The
Flax module returns a dict with at least:

    {"embeddings": (B, latent), "outputs": {var: (B, n_out)},
     "log_vars": {var: scalar param}}

and the shared ``loss_fn`` (consumed by train.Trainer) adds per-variable
masked losses (MSE / CE / Cox — reference direct_pred.py:146-260) plus any
model-specific extra losses via the ``_extra_losses`` hook (e.g. VAE MMD).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..data.dataset import MultiOmicDataset
from ..ops.losses import (
    compute_total_loss,
    cox_ph_loss,
    masked_ce_loss,
    masked_mse_loss,
)


def num_classes_for(ann_values: np.ndarray) -> int:
    """Output width of a categorical head: count of distinct encoded labels.

    Mirrors the reference's ``len(np.unique(ann[var]))`` (direct_pred.py:100)
    — NaN (missing) counts as one extra pseudo-class when present.
    """
    return int(np.unique(np.asarray(ann_values)).size)


def supervised_loss_terms(
    outputs: Dict[str, jnp.ndarray],
    y: Dict[str, jnp.ndarray],
    variables: List[str],
    variable_types: Dict[str, str],
    surv_event_var: Optional[str],
    surv_time_var: Optional[str],
) -> Dict[str, jnp.ndarray]:
    """Per-variable masked losses (reference direct_pred.py:238-253)."""
    losses = {}
    for var in variables:
        if surv_event_var is not None and var == surv_event_var:
            losses[var] = cox_ph_loss(
                outputs[var], y[surv_time_var], y[surv_event_var]
            )
        elif variable_types[var] == "numerical":
            losses[var] = masked_mse_loss(outputs[var], y[var])
        else:
            losses[var] = masked_ce_loss(outputs[var], y[var])
    return losses


class BaseModel:
    """Host-side orchestration shared by all architectures."""

    # subclasses set this; used by the CLI / registry
    model_name: str = "BaseModel"
    # name of the RNG streams the flax module consumes during training
    rng_streams = ("dropout",)

    def __init__(
        self,
        config: Dict[str, Any],
        dataset: MultiOmicDataset,
        target_variables: List[str],
        batch_variables: Optional[List[str]] = None,
        surv_event_var: Optional[str] = None,
        surv_time_var: Optional[str] = None,
        use_loss_weighting: bool = True,
        device_type: Optional[str] = None,
    ):
        self.config = dict(config)
        self.target_variables = list(target_variables)
        self.surv_event_var = surv_event_var
        self.surv_time_var = surv_time_var
        if surv_event_var is not None and surv_time_var is not None:
            if surv_event_var not in self.target_variables:
                self.target_variables = self.target_variables + [surv_event_var]
        self.batch_variables = list(batch_variables) if batch_variables else None
        self.variables = (
            self.target_variables + self.batch_variables
            if self.batch_variables
            else self.target_variables
        )
        self.use_loss_weighting = use_loss_weighting
        self.device_type = device_type

        self.variable_types = dataset.variable_types
        self.label_mappings = dataset.label_mappings
        self.ann = dataset.ann
        self.layers = list(dataset.dat.keys())
        self.input_dims = [len(dataset.features[k]) for k in self.layers]
        self.feature_names = {k: list(v) for k, v in dataset.features.items()}
        self.feature_importances: Dict[str, pd.DataFrame] = {}

        self.output_dims = {}
        for var in self.variables:
            if self.variable_types[var] == "numerical":
                self.output_dims[var] = 1
            else:
                self.output_dims[var] = num_classes_for(dataset.ann[var])

        self.module = self._build_module()
        self.params = None
        self.batch_stats = None

    # ------------------------------------------------------------ subclass API

    def _build_module(self):
        raise NotImplementedError

    def _apply(self, params, batch_stats, x: Dict[str, jnp.ndarray], rng, train):
        """Run the flax module; returns (out_dict, new_batch_stats).

        This is the TRAINING-path hook (loss_fn). Inference
        (predict/transform/attribution) routes through ``_eval_apply`` +
        ``_eval_extra_args`` instead — override those too if eval behavior
        must change."""
        variables = {"params": params, "batch_stats": batch_stats}
        rngs = None
        if train:
            keys = jax.random.split(rng, len(self.rng_streams))
            rngs = {name: k for name, k in zip(self.rng_streams, keys)}
        if train:
            out, mut = self.module.apply(
                variables,
                x,
                train=True,
                rngs=rngs,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        out = self.module.apply(variables, x, train=False)
        return out, batch_stats

    def _extra_losses(
        self, out: Dict[str, Any], batch: Dict[str, Any], rng
    ) -> Dict[str, jnp.ndarray]:
        """Model-specific additional loss terms (e.g. VAE MMD)."""
        return {}

    def _loss_apply_args(self, batch: Dict[str, Any]) -> tuple:
        """Extra positional args for _apply, drawn from the BATCH pytree.

        Large per-model constants (the GNN's dense adjacency operator) must
        reach jitted training programs as arguments, not closure constants:
        a closed-over array inlines into the HLO, which the remote-compile
        tunnel rejects past ~10 MB (HTTP 413 — e.g. a 2k-node STRING graph
        is a 16 MB operator). Models stash such constants in make_batch
        under "_"-prefixed keys (broadcast whole by every batcher: trainer,
        ParallelTrials, vmapped_grid_fit) and pull them back out here.
        """
        return ()

    # ------------------------------------------------------------ training API

    def init_params(self, dataset: MultiOmicDataset, seed: int = 42):
        x = {
            k: jnp.zeros((2, d), jnp.float32)
            for k, d in zip(self.layers, self.input_dims)
        }
        variables = self.module.init(jax.random.key(seed), x, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        return self.params, self.batch_stats

    def make_batch(self, dataset: MultiOmicDataset, indices=None):
        """Device-ready pytree {x: {layer: arr}, y: {var: arr}}."""
        dat, ann = dataset.as_arrays()
        x = {k: jnp.asarray(dat[k]) for k in self.layers}
        y_vars = set(self.variables)
        if self.surv_time_var:
            y_vars.add(self.surv_time_var)
        y = {v: jnp.asarray(ann[v]) for v in y_vars}
        batch = {"x": x, "y": y}
        if indices is not None:
            idx = jnp.asarray(np.asarray(indices))
            batch = jax.tree.map(lambda a: a[idx], batch)
        return batch

    def loss_fn(self, params, batch_stats, batch, rng, train: bool):
        """(total_loss, (losses, new_batch_stats)) — the Trainer contract."""
        apply_rng = None
        extra_rng = None
        if rng is not None:
            apply_rng, extra_rng = jax.random.split(rng)
        out, new_stats = self._apply(
            params, batch_stats, batch["x"], apply_rng, train,
            *self._loss_apply_args(batch),
        )
        losses = supervised_loss_terms(
            out["outputs"],
            batch["y"],
            self.variables,
            self.variable_types,
            self.surv_event_var,
            self.surv_time_var,
        )
        losses.update(self._extra_losses(out, batch, extra_rng))
        total = compute_total_loss(
            losses, out.get("log_vars"), self.use_loss_weighting
        )
        return total, (losses, new_stats)

    def fit(
        self,
        dataset: MultiOmicDataset,
        train_idx=None,
        val_idx=None,
        *,
        lr: float,
        batch_size: int,
        max_epochs: int,
        early_stop_patience: int = -1,
        seed: int = 42,
        mesh=None,
        checkpoint_dir=None,
        on_epoch_end=None,
    ):
        """Train this model on (a subset of) a dataset; stores best params."""
        from ..train.trainer import Trainer

        self.init_params(dataset, seed)
        if train_idx is None:
            train_idx = np.arange(len(dataset))
        train_data = self.make_batch(dataset, train_idx)
        val_data = self.make_batch(dataset, val_idx) if val_idx is not None else None
        trainer = Trainer(self.loss_fn, lr=lr, mesh=mesh)
        res = trainer.fit(
            self.params,
            self.batch_stats,
            train_data,
            val_data,
            n_samples=len(train_idx),
            batch_size=batch_size,
            max_epochs=max_epochs,
            early_stop_patience=early_stop_patience,
            rng=jax.random.key(seed),
            checkpoint_dir=checkpoint_dir,
            on_epoch_end=on_epoch_end,
        )
        self.params, self.batch_stats = res.params, res.batch_stats
        return res

    # ----------------------------------------------------------- inference API

    # cohorts above this size run eval forward in chunks to bound HBM use
    EVAL_CHUNK = 8192

    def _eval_extra_args(self) -> tuple:
        """Extra positional eval args (GNN: the adjacency).

        These are passed as jit ARGUMENTS through every inference program
        (eval forward AND attribution) — large arrays must arrive this way,
        never as closure constants (they inline into the HLO and the
        remote-compile tunnel rejects them with HTTP 413)."""
        return ()

    def _eval_apply(self, params, batch_stats, x, *extra):
        """Eval-mode module forward — the single inference hook.

        predict/transform/attribution all route through this (jitted, with
        params/stats/x/extra as arguments). Subclasses customizing eval
        behavior override THIS (plus ``_eval_extra_args`` for any array
        operands), not ``_apply``. The bf16 matmul-precision policy is NOT
        applied here but at the non-overridable program entry points
        (``_jitted_eval`` / ``_attribution_forward``) so overrides keep it
        automatically."""
        return self.module.apply(
            {"params": params, "batch_stats": batch_stats},
            x, *extra, train=False,
        )

    def _jitted_eval(self):
        """Cached jitted eval forward: params/stats/x are jit ARGUMENTS.

        An unjitted module.apply dispatches op-by-op — on the TPU tunnel
        that is one RPC per op — and a per-call jitted closure over params
        would both re-trace every call and inline the parameters into the
        HLO (HTTP 413 at production sizes).

        Matmuls run at bfloat16 precision like the training path — the
        reference sets torch.set_float32_matmul_precision("medium")
        GLOBALLY (main.py:24), so its inference shares the reduced-
        precision policy; full-f32 MXU passes would be ~3x slower for a
        precision the reference never delivers. (No-op on CPU backends —
        parity tests stay exact f32.) Applied HERE, not in ``_eval_apply``,
        so subclass overrides of the hook keep the policy."""
        if getattr(self, "_eval_jit", None) is None:

            @jax.jit
            def run(params, batch_stats, x, *extra):
                with jax.default_matmul_precision("bfloat16"):
                    return self._eval_apply(params, batch_stats, x, *extra)

            self._eval_jit = run
        return self._eval_jit

    def _forward_eval(self, x: Dict[str, jnp.ndarray]):
        run = self._jitted_eval()
        extra = self._eval_extra_args()
        n = next(iter(x.values())).shape[0]
        if n <= self.EVAL_CHUNK:
            return run(self.params, self.batch_stats, x, *extra)
        outs = []
        for start in range(0, n, self.EVAL_CHUNK):
            chunk = {k: v[start : start + self.EVAL_CHUNK] for k, v in x.items()}
            m = next(iter(chunk.values())).shape[0]
            if m < self.EVAL_CHUNK:
                # zero-pad the ragged tail so ONE compiled program serves
                # every chunk (a distinct tail shape costs 30-120s compile
                # through the tunnel); padded rows are trimmed after concat
                pad = self.EVAL_CHUNK - m
                chunk = {
                    k: jnp.pad(v, ((0, pad),) + ((0, 0),) * (v.ndim - 1))
                    for k, v in chunk.items()
                }
            outs.append(run(self.params, self.batch_stats, chunk, *extra))

        # concatenate ONLY batch-axis leaves: per-model non-batch outputs
        # (e.g. (1,)-shaped log_vars) are identical across chunks and must
        # not grow with the chunk count
        def combine(*parts):
            if (
                hasattr(parts[0], "ndim")
                and parts[0].ndim > 0
                and parts[0].shape[0] == self.EVAL_CHUNK
            ):
                return jnp.concatenate(parts, axis=0)[:n]
            return parts[0]

        return jax.tree.map(combine, *outs)

    def make_eval_x(self, dataset: MultiOmicDataset) -> Dict[str, jnp.ndarray]:
        """Plain {layer: matrix} inputs for predict/transform/attribution."""
        dat, _ = dataset.as_arrays()
        return {k: jnp.asarray(dat[k]) for k in self.layers}

    def predict(self, dataset: MultiOmicDataset) -> Dict[str, np.ndarray]:
        """Per-variable predictions: softmax probabilities for categorical
        variables, raw outputs for numerical (direct_pred.py:296-351)."""
        out = self._forward_eval(self.make_eval_x(dataset))
        preds = {}
        for var in self.variables:
            logits = out["outputs"][var]
            if self.variable_types[var] == "categorical":
                preds[var] = np.asarray(jax.nn.softmax(logits, axis=-1))
            else:
                preds[var] = np.asarray(logits)
        return preds

    def transform(self, dataset: MultiOmicDataset) -> pd.DataFrame:
        """Latent embeddings as a DataFrame (direct_pred.py:353-415)."""
        out = self._forward_eval(self.make_eval_x(dataset))
        emb = np.asarray(out["embeddings"])
        return pd.DataFrame(
            emb,
            index=dataset.samples,
            columns=[f"E{i}" for i in range(emb.shape[1])],
        )

    # ------------------------------------------------------ feature importance

    def _attribution_forward(self, params, batch_stats, x, target_var, *extra):
        """Pure forward for attribution: x -> outputs[target_var] (B, n_out).

        Routes through ``_eval_apply`` so the eval/attribution contracts
        cannot drift; ``extra`` carries ``_eval_extra_args()`` operands as
        jit arguments (GNN adjacency — see _eval_extra_args). Applies the
        same bf16 matmul-precision policy as ``_jitted_eval`` (this is the
        root the jitted attribution programs trace through)."""
        with jax.default_matmul_precision("bfloat16"):
            out = self._eval_apply(params, batch_stats, x, *extra)
        return out["outputs"][target_var]

    def compute_feature_importance(
        self,
        dataset: MultiOmicDataset,
        target_var: str,
        method: str = "IntegratedGradients",
        steps_or_samples: int = 5,
        batch_size: int = 512,
        mesh=None,
    ) -> pd.DataFrame:
        """Per-class feature attributions (reference direct_pred.py:432-590).

        IntegratedGradients / GradientShap reimplemented as vmapped jax.grad
        path integration — see interpret/attribution.py. ``mesh`` shards the
        sample axis over devices for large cohorts.
        """
        from ..interpret.attribution import compute_feature_importance as _cfi

        df = _cfi(
            self,
            dataset,
            target_var,
            method=method,
            steps_or_samples=steps_or_samples,
            batch_size=batch_size,
            mesh=mesh,
        )
        self.feature_importances[target_var] = df
        return df
