"""Shared TPU-native compute blocks (Flax modules, masked losses, kernels)."""

from .losses import (
    compute_mmd,
    compute_total_loss,
    cox_ph_loss,
    gaussian_kernel,
    masked_ce_loss,
    masked_mse_loss,
    mmd_loss,
    triplet_margin_loss,
)
from .mlp import MLP, Decoder, Encoder

__all__ = [
    "MLP",
    "Encoder",
    "Decoder",
    "masked_mse_loss",
    "masked_ce_loss",
    "cox_ph_loss",
    "compute_total_loss",
    "gaussian_kernel",
    "compute_mmd",
    "mmd_loss",
    "triplet_margin_loss",
]
