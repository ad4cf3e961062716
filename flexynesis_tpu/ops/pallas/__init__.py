"""Hand-written Pallas TPU kernels for the hot ops."""

from .fused_linear import fused_linear_bn_relu, fused_linear_bn_relu_eval
from .mmd_kernel import compute_mmd_pallas, gaussian_kernel_mean

__all__ = [
    "fused_linear_bn_relu",
    "fused_linear_bn_relu_eval",
    "compute_mmd_pallas",
    "gaussian_kernel_mean",
]
