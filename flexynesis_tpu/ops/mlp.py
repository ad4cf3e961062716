"""Reusable Flax building blocks mirroring the reference's shared nets.

Capability parity with /root/reference/flexynesis/modules.py:

* ``MLP``      — modules.py:106-150  (Linear -> BatchNorm -> ReLU -> Dropout(0.1)
                 -> Linear; the regression head (output_dim == 1) is bias-free)
* ``Encoder``  — modules.py:10-57    (stack of Linear -> LeakyReLU(0.2) -> BatchNorm,
                 then parallel mean / log_var heads; xavier-uniform weights)
* ``Decoder``  — modules.py:60-103   (same stack, sigmoid output head)

All modules are pure functions of (params, batch_stats, rng) — BatchNorm uses
flax's running statistics with torch-equivalent hyperparameters
(momentum 0.9 in flax convention == torch momentum 0.1, eps 1e-5).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .initializers import make_torch_bias_init, torch_linear_kernel_init, xavier_uniform

# torch BatchNorm1d defaults: eps=1e-5, momentum=0.1 (flax: momentum = 1 - 0.1)
BN_MOMENTUM = 0.9
BN_EPS = 1e-5


class MLP(nn.Module):
    """One-hidden-layer MLP used for modality encoders and supervisor heads.

    Matches reference modules.py:106-150: hidden size is clamped to >= 2 and the
    output layer has no bias for regression heads (output_dim == 1).
    """

    hidden_dim: int
    output_dim: int
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, *, train: bool):
        hidden = max(int(self.hidden_dim), 2)
        fan_in = x.shape[-1]
        x = nn.Dense(
            hidden,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            name="layer_1",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            name="batchnorm",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.output_dim,
            use_bias=self.output_dim > 1,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(hidden),
            name="layer_out",
        )(x)
        return x


class _HiddenStack(nn.Module):
    """Linear -> LeakyReLU(0.2) -> BatchNorm stack shared by Encoder/Decoder."""

    hidden_dims: Sequence[int]

    @nn.compact
    def __call__(self, x, *, train: bool):
        for i, h in enumerate(self.hidden_dims):
            fan_in = x.shape[-1]
            x = nn.Dense(
                int(h),
                kernel_init=xavier_uniform,
                bias_init=make_torch_bias_init(fan_in),
                name=f"dense_{i}",
            )(x)
            x = nn.leaky_relu(x, negative_slope=0.2)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                name=f"bn_{i}",
            )(x)
        return x


class Encoder(nn.Module):
    """VAE encoder: hidden stack followed by mean / log_var heads.

    Reference: modules.py:10-57.
    """

    hidden_dims: Sequence[int]
    latent_dim: int

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = _HiddenStack(self.hidden_dims, name="hidden_layers")(x, train=train)
        fan_in = h.shape[-1]
        mean = nn.Dense(
            self.latent_dim,
            kernel_init=xavier_uniform,
            bias_init=make_torch_bias_init(fan_in),
            name="FC_mean",
        )(h)
        log_var = nn.Dense(
            self.latent_dim,
            kernel_init=xavier_uniform,
            bias_init=make_torch_bias_init(fan_in),
            name="FC_var",
        )(h)
        return mean, log_var


class Decoder(nn.Module):
    """VAE decoder: hidden stack followed by a sigmoid output head.

    Reference: modules.py:60-103.
    """

    hidden_dims: Sequence[int]
    output_dim: int

    @nn.compact
    def __call__(self, x, *, train: bool):
        h = _HiddenStack(self.hidden_dims, name="hidden_layers")(x, train=train)
        fan_in = h.shape[-1]
        out = nn.Dense(
            self.output_dim,
            kernel_init=xavier_uniform,
            bias_init=make_torch_bias_init(fan_in),
            name="FC_output",
        )(h)
        return jnp.asarray(nn.sigmoid(out))
