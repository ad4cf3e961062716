"""FusedMLP: the reference MLP block backed by the Pallas fused kernel.

Drop-in alternative to ops.mlp.MLP (same parameter layout and semantics:
Linear -> BatchNorm -> ReLU -> Dropout -> Linear, bias-free regression head,
hidden clamped to >= 2) whose Linear->BN->ReLU chain executes as ONE Pallas
kernel on TPU (ops/pallas/fused_linear.py); dropout applies outside the
kernel via ``nn.Dropout`` (same rng stream as the unfused MLP — a seeded
in-kernel PRNG cannot batch under the trial engine's vmap). Models opt in
via config ``fused_kernels=True``; on CPU the kernel interprets (tests) so
behavior is identical everywhere.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .initializers import make_torch_bias_init, torch_linear_kernel_init
from .mlp import BN_EPS, BN_MOMENTUM
from .pallas.fused_linear import fused_linear_bn_relu, fused_linear_bn_relu_eval


class FusedMLP(nn.Module):
    hidden_dim: int
    output_dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        hidden = max(int(self.hidden_dim), 2)
        fan_in = x.shape[-1]
        kernel = self.param(
            "layer_1_kernel", torch_linear_kernel_init, (fan_in, hidden)
        )
        bias = self.param(
            "layer_1_bias", make_torch_bias_init(fan_in), (hidden,)
        )
        gamma = self.param("bn_scale", nn.initializers.ones, (hidden,))
        beta = self.param("bn_bias", nn.initializers.zeros, (hidden,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros(hidden, jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones(hidden, jnp.float32)
        )

        if train:
            h, mu, var = fused_linear_bn_relu(
                x, kernel, bias, gamma, beta, BN_EPS
            )
            if not self.is_initializing():
                # torch momentum-0.1 update; unbiased var like torch BN
                n = x.shape[0]
                unbias = n / max(n - 1, 1)
                ra_mean.value = (
                    BN_MOMENTUM * ra_mean.value + (1 - BN_MOMENTUM) * mu
                )
                ra_var.value = (
                    BN_MOMENTUM * ra_var.value + (1 - BN_MOMENTUM) * var * unbias
                )
            # dropout lives OUTSIDE the Pallas kernel (a scalar seed operand
            # has no legal block shape under the trial engine's vmap); same
            # rng stream + semantics as the unfused MLP block
            h = nn.Dropout(rate=self.dropout_rate, deterministic=False)(h)
        else:
            h = fused_linear_bn_relu_eval(
                x, kernel, bias, gamma, beta, ra_mean.value, ra_var.value,
                BN_EPS,
            )

        out = nn.Dense(
            self.output_dim,
            use_bias=self.output_dim > 1,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(hidden),
            name="layer_out",
        )(h)
        return out
