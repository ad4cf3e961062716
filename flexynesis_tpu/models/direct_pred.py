"""DirectPred: per-modality MLP encoders -> fusion -> multi-task heads.

Capability parity with /root/reference/flexynesis/models/direct_pred.py:
per-modality ``MLP`` encoders into latent_dim (:73-93, hidden size =
input_dim * hidden_dim_factor), a linear fusion block when >1 modality
(:87-93), per-variable MLP supervisor heads (:95-105), masked MSE / CE / Cox
losses with Kendall uncertainty weighting (:146-223).

TPU-first: the whole forward is one Flax module — every encoder matmul is a
single large MXU-tiled GEMM per modality, fused with BatchNorm/ReLU by XLA.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops.initializers import make_torch_bias_init, torch_linear_kernel_init
from ..ops.mlp import MLP
from .base import BaseModel


class DirectPredNet(nn.Module):
    layer_names: Tuple[str, ...]
    input_dims: Tuple[int, ...]
    latent_dim: int
    hidden_dim_factor: float
    supervisor_hidden_dim: int
    output_dims: Dict[str, int]
    use_loss_weighting: bool = True
    fused_kernels: bool = False  # Pallas fused MLP blocks (ops/fused_mlp.py)

    def setup(self):
        if self.fused_kernels:
            from ..ops.fused_mlp import FusedMLP as MLPBlock
        else:
            MLPBlock = MLP
        self.encoders = [
            MLPBlock(
                hidden_dim=int(d * self.hidden_dim_factor),
                output_dim=self.latent_dim,
                name=f"encoder_{ln}",
            )
            for ln, d in zip(self.layer_names, self.input_dims)
        ]
        if len(self.input_dims) > 1:
            fan_in = self.latent_dim * len(self.input_dims)
            self.fusion_block = nn.Dense(
                self.latent_dim,
                kernel_init=torch_linear_kernel_init,
                bias_init=make_torch_bias_init(fan_in),
                name="fusion_block",
            )
        self.heads = {
            var: MLPBlock(
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

    def encode(self, x: Dict[str, jnp.ndarray], *, train: bool) -> jnp.ndarray:
        embs = [
            enc(x[ln], train=train) for ln, enc in zip(self.layer_names, self.encoders)
        ]
        concat = jnp.concatenate(embs, axis=-1)
        if len(self.input_dims) > 1:
            return self.fusion_block(concat)
        return concat

    def __call__(self, x: Dict[str, jnp.ndarray], *, train: bool):
        emb = self.encode(x, train=train)
        outputs = {var: head(emb, train=train) for var, head in self.heads.items()}
        out = {"embeddings": emb, "outputs": outputs}
        if self.use_loss_weighting:
            out["log_vars"] = self.log_vars
        return out


class DirectPred(BaseModel):
    model_name = "DirectPred"

    def _build_module(self):
        return DirectPredNet(
            layer_names=tuple(self.layers),
            input_dims=tuple(self.input_dims),
            latent_dim=int(self.config["latent_dim"]),
            hidden_dim_factor=float(self.config["hidden_dim_factor"]),
            supervisor_hidden_dim=int(self.config["supervisor_hidden_dim"]),
            output_dims=dict(self.output_dims),
            use_loss_weighting=self.use_loss_weighting,
            fused_kernels=bool(self.config.get("fused_kernels", False)),
        )
