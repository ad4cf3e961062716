"""Supervised VAE with MMD regularization (VAE-MMD).

Capability parity with /root/reference/flexynesis/models/supervised_vae.py:
per-modality ``Encoder`` stacks (one hidden layer of size
max(input_dim * hidden_dim_factor, 2)), FC_mean / FC_log_var over the
concatenated per-modality means / log-vars (:92-104), reparameterized latent
(note the reference's quirk z = mean + log_var * eps, :187-200 — reproduced),
per-modality sigmoid ``Decoder``s, supervisor MLP heads on z, and a per-layer
loss MMD(z, N(0, I) 200-draw prior) + recon-MSE averaged over layers
(:291-340, :494-550) entering the uncertainty-weighted total as 'mmd_loss'.

Deviation (documented): at eval time the latent is deterministic (eps = 0 so
z == mean); the reference samples noise even in eval mode, making its
embeddings/predictions stochastic.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.initializers import make_torch_bias_init, torch_linear_kernel_init
from ..ops.losses import mmd_loss
from ..ops.mlp import MLP, Decoder, Encoder
from .base import BaseModel


class SupervisedVAENet(nn.Module):
    layer_names: Tuple[str, ...]
    input_dims: Tuple[int, ...]
    latent_dim: int
    hidden_dim_factor: float
    supervisor_hidden_dim: int
    output_dims: Dict[str, int]
    use_loss_weighting: bool = True

    def setup(self):
        hidden = [
            max(int(d * self.hidden_dim_factor), 2) for d in self.input_dims
        ]
        self.encoders = [
            Encoder([h], self.latent_dim, name=f"encoder_{ln}")
            for ln, h in zip(self.layer_names, hidden)
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
            for ln, h, d in zip(self.layer_names, hidden, self.input_dims)
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

    def encode(self, x: Dict[str, jnp.ndarray], *, train: bool):
        means, log_vars = [], []
        for ln, enc in zip(self.layer_names, self.encoders):
            m, lv = enc(x[ln], train=train)
            means.append(m)
            log_vars.append(lv)
        mean = self.FC_mean(jnp.concatenate(means, axis=-1))
        log_var = self.FC_log_var(jnp.concatenate(log_vars, axis=-1))
        return mean, log_var

    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool):
        mean, log_var = self.encode(x, train=train)
        if train:
            eps = jax.random.normal(self.make_rng("sample"), log_var.shape)
        else:
            eps = jnp.zeros_like(log_var)
        # reference reparameterization multiplies by log_var itself
        # (supervised_vae.py:198-200), not exp(0.5 * log_var)
        z = mean + log_var * eps

        x_hat = {
            ln: dec(z, train=train)
            for ln, dec in zip(self.layer_names, self.decoders)
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


class SupervisedVAE(BaseModel):
    model_name = "supervised_vae"
    rng_streams = ("dropout", "sample")

    def _build_module(self):
        return SupervisedVAENet(
            layer_names=tuple(self.layers),
            input_dims=tuple(self.input_dims),
            latent_dim=int(self.config["latent_dim"]),
            hidden_dim_factor=float(self.config["hidden_dim_factor"]),
            supervisor_hidden_dim=int(self.config["supervisor_hidden_dim"]),
            output_dims=dict(self.output_dims),
            use_loss_weighting=self.use_loss_weighting,
        )

    def _extra_losses(self, out, batch, rng):
        """Per-layer MMD + recon-MSE, averaged (supervised_vae.py:308-317)."""
        if rng is None:
            rng = jax.random.key(0)
        keys = jax.random.split(rng, len(self.layers))
        aux = batch.get("_aux")
        if aux is not None:
            # heterogeneous-trial padding: restrict the MMD to the trial's
            # active latent dims (exact small-architecture loss)
            from ..ops.losses import masked_mmd_loss

            terms = [
                masked_mmd_loss(
                    k, out["embeddings"], out["x_hat"][ln], batch["x"][ln],
                    aux["latent_mask"], aux["latent_dim"],
                )
                for k, ln in zip(keys, self.layers)
            ]
            return {"mmd_loss": jnp.mean(jnp.stack(terms))}
        loss_impl = mmd_loss
        if self.config.get("fused_kernels"):
            from ..ops.pallas.mmd_kernel import mmd_loss_pallas as loss_impl
        terms = [
            loss_impl(k, out["embeddings"], out["x_hat"][ln], batch["x"][ln])
            for k, ln in zip(keys, self.layers)
        ]
        return {"mmd_loss": jnp.mean(jnp.stack(terms))}
