"""GNN (early fusion): one FlexGCN over the gene-interaction node tensor.

Capability parity with /root/reference/flexynesis/models/gnn_early.py: a
single flexGCN encoder over the MultiOmicDatasetNW node-feature tensor
(nodes = genes, node features = per-modality values; :111-127), conv type
from --gnn_conv_type, shared edge_index across samples (:101-103), standard
multi-task heads/losses, and per-node attributions split back per original
omic layer (:440-633).

TPU-first: the edge list becomes an aggregation operator built once on
host (ops/graph_conv.py) and living on device for the model's lifetime —
dense (N, N) below SPARSE_NODE_THRESHOLD nodes (every conv is a batched
MXU einsum, measured FASTER than sparse up to ~6k nodes despite ~1000x
the raw multiply-adds) and a padded dst-sorted edge list above it
(segment_sum aggregation: the dense form's n^2 storage and compile cost
stop being viable at STRING scale — measured crossover in
ops/graph_conv.py). Config ``gnn_sparse`` in {"auto", true, false}
overrides.
"""

from __future__ import annotations

from typing import Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from ..ops.graph_conv import (
    SPARSE_NODE_THRESHOLD,
    FlexGCN,
    build_operator,
    build_sparse_operator,
)
from ..ops.mlp import MLP
from .base import BaseModel


class GNNNet(nn.Module):
    n_nodes: int
    n_node_feats: int
    node_embedding_dim: int
    latent_dim: int
    num_convs: int
    conv_type: str
    activation: str
    readout: str
    supervisor_hidden_dim: int
    output_dims: Dict[str, int]
    use_loss_weighting: bool = True

    def setup(self):
        self.encoder = FlexGCN(
            n_nodes=self.n_nodes,
            node_embedding_dim=self.node_embedding_dim,
            output_dim=self.latent_dim,
            num_convs=self.num_convs,
            conv_type=self.conv_type,
            activation=self.activation,
            readout=self.readout,
            name="encoder",
        )
        self.heads = {
            var: MLP(
                hidden_dim=self.supervisor_hidden_dim,
                output_dim=n_out,
                name=f"head_{var}",
            )
            for var, n_out in self.output_dims.items()
        }
        if self.use_loss_weighting:
            self.log_vars = {
                var: self.param(f"log_var_{var}", nn.initializers.zeros, (1,))
                for var in self.output_dims
            }

    def __call__(self, x: Dict[str, jnp.ndarray], adj: jnp.ndarray, *, train: bool):
        nodes = x["all"].reshape(-1, self.n_nodes, self.n_node_feats)
        emb = self.encoder(nodes, adj, train=train)
        outputs = {var: head(emb, train=train) for var, head in self.heads.items()}
        out = {"embeddings": emb, "outputs": outputs}
        if self.use_loss_weighting:
            out["log_vars"] = self.log_vars
        return out


class GNN(BaseModel):
    model_name = "GNN"

    def __init__(
        self,
        config,
        dataset,
        target_variables,
        batch_variables=None,
        surv_event_var=None,
        surv_time_var=None,
        use_loss_weighting=True,
        device_type=None,
        gnn_conv_type: str = "GC",
    ):
        self.gnn_conv_type = gnn_conv_type or "GC"
        self.n_nodes = len(dataset.node_names)
        self.n_node_feats = dataset.node_features.shape[2]
        # accept only True/False/"auto" (strings normalized case-
        # insensitively, so a YAML/CLI passthrough of "false" doesn't
        # silently truthy-select the sparse path); reject anything else
        sparse_cfg = config.get("gnn_sparse", "auto")
        if isinstance(sparse_cfg, str):
            norm = sparse_cfg.strip().lower()
            if norm in ("true", "false", "auto"):
                sparse_cfg = {"true": True, "false": False, "auto": "auto"}[norm]
            else:
                raise ValueError(
                    f"gnn_sparse must be true/false/'auto', got {sparse_cfg!r}"
                )
        elif not isinstance(sparse_cfg, (bool, np.bool_)):
            raise ValueError(
                f"gnn_sparse must be true/false/'auto', got {sparse_cfg!r}"
            )
        if sparse_cfg == "auto":
            sparse_cfg = self.n_nodes >= SPARSE_NODE_THRESHOLD
        if sparse_cfg:
            self._adj = jax.tree.map(
                jnp.asarray,
                build_sparse_operator(
                    dataset.edge_index, self.n_nodes, self.gnn_conv_type
                ),
            )
        else:
            self._adj = jnp.asarray(
                build_operator(
                    dataset.edge_index, self.n_nodes, self.gnn_conv_type
                )
            )
        self.nw_dataset = dataset
        super().__init__(
            config,
            dataset,
            target_variables,
            batch_variables=batch_variables,
            surv_event_var=surv_event_var,
            surv_time_var=surv_time_var,
            use_loss_weighting=use_loss_weighting,
            device_type=device_type,
        )

    def _build_module(self):
        return GNNNet(
            n_nodes=self.n_nodes,
            n_node_feats=self.n_node_feats,
            node_embedding_dim=int(self.config["node_embedding_dim"]),
            latent_dim=int(self.config["latent_dim"]),
            num_convs=int(self.config["num_convs"]),
            conv_type=self.gnn_conv_type,
            activation=str(self.config.get("activation", "relu")),
            supervisor_hidden_dim=int(self.config["supervisor_hidden_dim"]),
            output_dims=dict(self.output_dims),
            use_loss_weighting=self.use_loss_weighting,
            readout=str(self.config.get("gnn_readout", "flatten")),
        )

    def init_params(self, dataset, seed: int = 42):
        x = {"all": jnp.zeros((2, self.n_nodes * self.n_node_feats), jnp.float32)}
        variables = self.module.init(jax.random.key(seed), x, self._adj, train=False)
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        return self.params, self.batch_stats

    def make_batch(self, dataset, indices=None):
        # the dense operator rides in the batch under a "_" key (broadcast
        # whole by trainer/ParallelTrials/vmapped_grid_fit, never row-
        # sliced) so jitted TRAINING programs receive it as an argument —
        # added after the index slicing on purpose
        batch = super().make_batch(dataset, indices)
        batch["_adj"] = self._adj
        return batch

    def _loss_apply_args(self, batch) -> tuple:
        # see BaseModel._loss_apply_args: a closed-over 2k-node operator
        # (16 MB) inlines into the HLO and trips the tunnel's HTTP 413
        adj = batch.get("_adj")
        return (adj,) if adj is not None else ()

    def _apply(self, params, batch_stats, x, rng, train, adj=None):
        variables = {"params": params, "batch_stats": batch_stats}
        adj = self._adj if adj is None else adj
        if train:
            rngs = {"dropout": rng}
            out, mut = self.module.apply(
                variables, x, adj, train=True, rngs=rngs,
                mutable=["batch_stats"],
            )
            return out, mut["batch_stats"]
        out = self.module.apply(variables, x, adj, train=False)
        return out, batch_stats

    def _eval_extra_args(self) -> tuple:
        # the dense operator rides into eval/attribution programs as a jit
        # ARGUMENT — closing over it would inline a (n_nodes, n_nodes)
        # constant into the HLO (HTTP 413 through the tunnel at scale)
        return (self._adj,)

    def compute_feature_importance(
        self,
        dataset,
        target_var,
        method="IntegratedGradients",
        steps_or_samples=5,
        batch_size=512,
        mesh=None,
    ) -> pd.DataFrame:
        """Node attributions split per original omic layer (gnn_early.py:599-633)."""
        from ..interpret.attribution import abs_attribution_sums

        sums, n_class, n = abs_attribution_sums(
            self, dataset, target_var,
            method=method, steps_or_samples=steps_or_samples,
            batch_size=batch_size, mesh=mesh,
        )
        orig_layers = list(
            getattr(dataset, "multiomic_dataset", dataset).dat.keys()
        )
        node_names = list(dataset.node_names)
        out_rows = []
        for c in range(n_class):
            imp = (np.asarray(sums[c]["all"]) / n).reshape(
                self.n_nodes, self.n_node_feats
            )
            label = (
                dataset.label_mappings[target_var].get(c)
                if target_var in dataset.label_mappings
                else ""
            )
            for li, layer_name in enumerate(orig_layers):
                col = li if self.n_node_feats > 1 else 0
                out_rows.append(
                    pd.DataFrame(
                        {
                            "target_variable": target_var,
                            "target_class": c,
                            "target_class_label": label,
                            "layer": layer_name,
                            "name": node_names,
                            "importance": imp[:, col],
                        }
                    )
                )
        result = pd.concat(out_rows, ignore_index=True)
        self.feature_importances[target_var] = result
        return result
