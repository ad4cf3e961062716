"""CrossModalPred: cross-modality translation on the VAE-MMD backbone.

Capability parity with /root/reference/flexynesis/models/crossmodal_pred.py:
encodes a subset of modalities (``input_layers``, :79-98) and reconstructs a
possibly different subset (``output_layers``, :100-118); loss = mean over
output layers of MMD(z, prior) + recon MSE plus supervisor losses
(:293-340); adds ``decode(dataset)`` returning reconstructed per-output-layer
DataFrames (:467-481). Early fusion is rejected by the CLI for this model
(__main__.py:1007-1012).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import pandas as pd

from ..ops.initializers import make_torch_bias_init, torch_linear_kernel_init
from ..ops.losses import mmd_loss
from ..ops.mlp import MLP, Decoder, Encoder
from .base import BaseModel


class CrossModalPredNet(nn.Module):
    input_layer_names: Tuple[str, ...]
    output_layer_names: Tuple[str, ...]
    input_dims: Tuple[int, ...]
    output_layer_dims: Tuple[int, ...]
    latent_dim: int
    hidden_dim_factor: float
    supervisor_hidden_dim: int
    output_dims: Dict[str, int]
    use_loss_weighting: bool = True

    def setup(self):
        enc_hidden = [
            max(int(d * self.hidden_dim_factor), 2) for d in self.input_dims
        ]
        dec_hidden = [
            max(int(d * self.hidden_dim_factor), 2) for d in self.output_layer_dims
        ]
        self.encoders = [
            Encoder([h], self.latent_dim, name=f"encoder_{ln}")
            for ln, h in zip(self.input_layer_names, enc_hidden)
        ]
        n = len(self.input_dims)
        fan_in = n * self.latent_dim
        self.FC_mean = nn.Dense(
            self.latent_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            name="FC_mean",
        )
        self.FC_log_var = nn.Dense(
            self.latent_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            name="FC_log_var",
        )
        self.decoders = [
            Decoder([h], d, name=f"decoder_{ln}")
            for ln, h, d in zip(self.output_layer_names, dec_hidden, self.output_layer_dims)
        ]
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
            self.log_vars_mmd = self.param(
                "log_var_mmd_loss", nn.initializers.zeros, (1,)
            )

    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool):
        means, log_vars = [], []
        for ln, enc in zip(self.input_layer_names, self.encoders):
            m, lv = enc(x[ln], train=train)
            means.append(m)
            log_vars.append(lv)
        mean = self.FC_mean(jnp.concatenate(means, axis=-1))
        log_var = self.FC_log_var(jnp.concatenate(log_vars, axis=-1))
        if train:
            eps = jax.random.normal(self.make_rng("sample"), log_var.shape)
        else:
            eps = jnp.zeros_like(log_var)
        z = mean + log_var * eps  # reference quirk, crossmodal_pred.py reparam

        x_hat = {
            ln: dec(z, train=train)
            for ln, dec in zip(self.output_layer_names, self.decoders)
        }
        outputs = {var: head(z, train=train) for var, head in self.heads.items()}
        out = {
            "embeddings": z,
            "outputs": outputs,
            "mean": mean,
            "log_var": log_var,
            "x_hat": x_hat,
        }
        if self.use_loss_weighting:
            lv = dict(self.log_vars)
            lv["mmd_loss"] = self.log_vars_mmd
            out["log_vars"] = lv
        return out


class CrossModalPred(BaseModel):
    model_name = "CrossModalPred"
    rng_streams = ("dropout", "sample")

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
        input_layers: Optional[List[str]] = None,
        output_layers: Optional[List[str]] = None,
    ):
        all_layers = list(dataset.dat.keys())
        self.input_layers = list(input_layers) if input_layers else all_layers
        self.output_layers = list(output_layers) if output_layers else all_layers
        self._dataset_features = dataset.features
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
        # model consumes only the input layers (attribution, transform, predict)
        self.layers = list(self.input_layers)
        self.input_dims = [len(dataset.features[k]) for k in self.layers]

    def _build_module(self):
        return CrossModalPredNet(
            input_layer_names=tuple(self.input_layers),
            output_layer_names=tuple(self.output_layers),
            input_dims=tuple(
                len(self._dataset_features[k]) for k in self.input_layers
            ),
            output_layer_dims=tuple(
                len(self._dataset_features[k]) for k in self.output_layers
            ),
            latent_dim=int(self.config["latent_dim"]),
            hidden_dim_factor=float(self.config["hidden_dim_factor"]),
            supervisor_hidden_dim=int(self.config["supervisor_hidden_dim"]),
            output_dims=dict(self.output_dims),
            use_loss_weighting=self.use_loss_weighting,
        )

    def make_batch(self, dataset, indices=None):
        """Include output-layer matrices too (needed as recon targets)."""
        batch = super().make_batch(dataset, indices=None)
        import numpy as np

        dat, _ = dataset.as_arrays()
        for ln in self.output_layers:
            if ln not in batch["x"]:
                batch["x"][ln] = jnp.asarray(dat[ln])
        if indices is not None:
            idx = jnp.asarray(np.asarray(indices))
            batch = jax.tree.map(lambda a: a[idx], batch)
        return batch

    def _extra_losses(self, out, batch, rng):
        if rng is None:
            rng = jax.random.key(0)
        keys = jax.random.split(rng, len(self.output_layers))
        aux = batch.get("_aux")
        if aux is not None:
            # heterogeneous-trial padding: exact small-architecture MMD over
            # the trial's active latent dims (parallel/hetero.py)
            from ..ops.losses import masked_mmd_loss

            terms = [
                masked_mmd_loss(
                    k, out["embeddings"], out["x_hat"][ln], batch["x"][ln],
                    aux["latent_mask"], aux["latent_dim"],
                )
                for k, ln in zip(keys, self.output_layers)
            ]
            return {"mmd_loss": jnp.mean(jnp.stack(terms))}
        loss_impl = mmd_loss
        if self.config.get("fused_kernels"):
            from ..ops.pallas.mmd_kernel import mmd_loss_pallas as loss_impl
        terms = [
            loss_impl(k, out["embeddings"], out["x_hat"][ln], batch["x"][ln])
            for k, ln in zip(keys, self.output_layers)
        ]
        return {"mmd_loss": jnp.mean(jnp.stack(terms))}

    def decode(self, dataset) -> Dict[str, pd.DataFrame]:
        """Reconstructed output-layer matrices (crossmodal_pred.py:467-481)."""
        out = self._forward_eval(self.make_eval_x(dataset))
        import numpy as np

        return {
            ln: pd.DataFrame(
                np.asarray(out["x_hat"][ln]),
                index=dataset.samples,
                columns=dataset.features[ln],
            )
            for ln in self.output_layers
        }
