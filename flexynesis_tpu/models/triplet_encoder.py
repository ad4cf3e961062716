"""MultiTripletNetwork: triplet-margin metric learning + supervisor heads.

Capability parity with /root/reference/flexynesis/models/triplet_encoder.py:
shared per-modality MLP encoders + fusion (same backbone as DirectPred),
triplet margin loss (margin 1.0, squared-distance formulation :178-194) on
anchor/positive/negative embeddings, supervisor heads on the anchor
embedding; the first target variable must be categorical (:69-75); log_vars
cover variables + 'triplet_loss' (:77-86).

TPU-first redesign of the sampler: the reference draws positives/negatives
with host RNG per __getitem__ (data.py:1106-1131). Here label groups are
padded index tables on device and pos/neg partners are drawn *inside the
jitted train step* with jax.random — fresh triplets every step, zero host
traffic. Anchor/positive/negative encode as one stacked (3B, F) GEMM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.losses import compute_total_loss
from .base import BaseModel, supervised_loss_terms
from .direct_pred import DirectPredNet
import flax.linen as nn


class TripletNet(DirectPredNet):
    """DirectPred backbone with an extra log-var for the triplet loss."""

    def setup(self):
        super().setup()
        if self.use_loss_weighting:
            self.log_var_triplet = self.param(
                "log_var_triplet_loss", nn.initializers.zeros, (1,)
            )

    def __call__(self, x, *, train: bool):
        out = super().__call__(x, train=train)
        if self.use_loss_weighting:
            lv = dict(out["log_vars"])
            lv["triplet_loss"] = self.log_var_triplet
            out["log_vars"] = lv
        return out


class MultiTripletNetwork(BaseModel):
    model_name = "MultiTripletNetwork"

    def __init__(self, config, dataset, target_variables, *args, **kwargs):
        main_var = target_variables[0]
        if dataset.variable_types[main_var] != "categorical":
            raise ValueError(
                "The first target variable must be categorical for "
                "MultiTripletNetwork (reference triplet_encoder.py:69-75)."
            )
        self.main_var = main_var
        super().__init__(config, dataset, target_variables, *args, **kwargs)
        self._build_sampler(dataset)

    def _build_module(self):
        return TripletNet(
            layer_names=tuple(self.layers),
            input_dims=tuple(self.input_dims),
            latent_dim=int(self.config["latent_dim"]),
            hidden_dim_factor=float(self.config["hidden_dim_factor"]),
            supervisor_hidden_dim=int(self.config["supervisor_hidden_dim"]),
            output_dims=dict(self.output_dims),
            use_loss_weighting=self.use_loss_weighting,
        )

    # ------------------------------------------------------------- sampler

    def _build_sampler(self, dataset):
        """Padded per-label index tables for on-device pos/neg sampling.

        Anchors are samples with a non-missing main label; the negative pool
        includes the missing-label group (reference data.py:1106-1151).
        """
        labels = np.asarray(dataset.ann[self.main_var], dtype=np.float64)
        valid = np.isfinite(labels) & (labels != -1)
        groups = [np.where(valid & (labels == g))[0] for g in np.unique(labels[valid])]
        group_of = {}
        for gi, idxs in enumerate(groups):
            for i in idxs:
                group_of[int(i)] = gi
        if (~valid).any():
            groups.append(np.where(~valid)[0])
        max_size = max(len(g) for g in groups)
        table = np.zeros((len(groups), max_size), dtype=np.int32)
        counts = np.zeros(len(groups), dtype=np.int32)
        for gi, idxs in enumerate(groups):
            table[gi, : len(idxs)] = idxs
            counts[gi] = len(idxs)
        self._group_table = jnp.asarray(table)
        self._group_counts = jnp.asarray(counts)
        self._n_groups = len(groups)
        anchors = np.where(valid)[0].astype(np.int32)
        self._anchor_indices = anchors
        self._anchor_groups = np.asarray(
            [group_of[int(i)] for i in anchors], dtype=np.int32
        )

    # ---------------------------------------------------------- batch logic

    def make_batch(self, dataset, indices=None):
        """Triplet training batches carry anchor indices + the full matrices.

        ``indices`` index into the ANCHOR list (len == n valid-label samples),
        matching the reference where the triplet dataset length is the anchor
        count (data.py:1102).
        """
        dat, ann = dataset.as_arrays()
        full_x = {k: jnp.asarray(dat[k]) for k in self.layers}
        y_vars = set(self.variables)
        if self.surv_time_var:
            y_vars.add(self.surv_time_var)
        anchors = self._anchor_indices
        agroups = self._anchor_groups
        if indices is not None:
            indices = np.asarray(indices)
            anchors = anchors[indices]
            agroups = agroups[indices]
        y = {v: jnp.asarray(ann[v])[jnp.asarray(anchors)] for v in y_vars}
        return {
            "anchor_idx": jnp.asarray(anchors),
            "anchor_group": jnp.asarray(agroups),
            "y": y,
            "_full_x": full_x,  # broadcast leaf: same arrays every batch
        }

    def n_train_samples(self, dataset=None) -> int:
        return len(self._anchor_indices)

    def loss_fn(self, params, batch_stats, batch, rng, train: bool):
        if rng is None:
            rng = jax.random.key(0)
        r_apply, r_pos, r_neg, r_grp = jax.random.split(rng, 4)

        anchor_idx = batch["anchor_idx"]
        agrp = batch["anchor_group"]
        B = anchor_idx.shape[0]
        full_x = batch["_full_x"]

        # positive: same group as anchor
        pos_u = jax.random.randint(r_pos, (B,), 0, 1 << 30)
        pos_slot = pos_u % self._group_counts[agrp]
        pos_idx = self._group_table[agrp, pos_slot]
        # negative: uniform over the other groups (missing-label group incl.)
        g_u = jax.random.randint(r_grp, (B,), 0, self._n_groups - 1)
        neg_grp = g_u + (g_u >= agrp)
        neg_u = jax.random.randint(r_neg, (B,), 0, 1 << 30)
        neg_slot = neg_u % self._group_counts[neg_grp]
        neg_idx = self._group_table[neg_grp, neg_slot]

        idx3 = jnp.concatenate([anchor_idx, pos_idx, neg_idx])
        x3 = {k: v[idx3] for k, v in full_x.items()}
        out, new_stats = self._apply(params, batch_stats, x3, r_apply, train)
        emb = out["embeddings"]
        anchor_e, pos_e, neg_e = emb[:B], emb[B : 2 * B], emb[2 * B :]

        outputs = {var: o[:B] for var, o in out["outputs"].items()}
        losses = {"triplet_loss": _squared_triplet_loss(anchor_e, pos_e, neg_e)}
        losses.update(
            supervised_loss_terms(
                outputs,
                batch["y"],
                self.variables,
                self.variable_types,
                self.surv_event_var,
                self.surv_time_var,
            )
        )
        total = compute_total_loss(losses, out.get("log_vars"), self.use_loss_weighting)
        return total, (losses, new_stats)

    def fit(self, dataset, train_idx=None, val_idx=None, **kwargs):
        """Index splits refer to anchors, not raw samples."""
        if train_idx is None:
            train_idx = np.arange(len(self._anchor_indices))
        return super().fit(dataset, train_idx, val_idx, **kwargs)


def _squared_triplet_loss(anchor, positive, negative, margin: float = 1.0):
    """mean(relu(d2(a,p) - d2(a,n) + margin)) on SQUARED distances —
    the reference's formulation (triplet_encoder.py:178-194), which differs
    from torch.nn.TripletMarginLoss."""
    d_pos = jnp.sum(jnp.square(anchor - positive), axis=-1)
    d_neg = jnp.sum(jnp.square(anchor - negative), axis=-1)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))
