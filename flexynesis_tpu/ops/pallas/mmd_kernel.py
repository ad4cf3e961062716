"""Pallas TPU kernel: Gaussian-kernel MMD mean without materializing (N, M).

The VAE/CrossModal loss evaluates exp(-mean((x_i - y_j)^2)/d) over all pairs
(supervised_vae.py:494-530). The XLA path in ops/losses.py uses the Gram
expansion (one matmul) but pays f32 cancellation error and materializes the
full pairwise block. This kernel streams y in tiles, computes exact squared
distances per tile via the MXU, applies exp and accumulates the global mean
in f32 — fused, exact, and O(tile) memory.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel_mean_kernel(x_ref, y_ref, out_ref, *, dim: int, n_valid_x: int,
                        n_valid_y: int, tile_m: int):
    j = pl.program_id(0)
    x = x_ref[:]
    y = y_ref[:]
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    y2 = jnp.sum(jnp.square(y), axis=1, keepdims=True)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    sq = jnp.maximum(x2 + y2.T - 2.0 * xy, 0.0)
    k = jnp.exp(-sq / (dim * float(dim)))
    # mask padded rows/cols
    ri = jax.lax.broadcasted_iota(jnp.int32, k.shape, 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, k.shape, 1) + j * tile_m
    mask = (ri < n_valid_x) & (ci < n_valid_y)
    partial = jnp.sum(jnp.where(mask, k, 0.0))

    @pl.when(j == 0)
    def _():
        out_ref[0, 0] = 0.0

    out_ref[0, 0] += partial


def gaussian_kernel_mean(x: jnp.ndarray, y: jnp.ndarray,
                         tile_m: int = 512) -> jnp.ndarray:
    """mean_ij exp(-mean_d((x_i - y_j)^2) / d) — fused Pallas reduction."""
    n, d = x.shape
    m = y.shape[0]
    np_ = _round_up(n, 8)
    mp = _round_up(m, tile_m if m > tile_m else 8)
    dp = _round_up(d, 128)
    xq = jnp.pad(x.astype(jnp.float32), ((0, np_ - n), (0, dp - d)))
    yq = jnp.pad(y.astype(jnp.float32), ((0, mp - m), (0, dp - d)))
    tile = min(tile_m, mp)
    kernel = functools.partial(
        _kernel_mean_kernel, dim=d, n_valid_x=n, n_valid_y=m, tile_m=tile
    )
    total = pl.pallas_call(
        kernel,
        grid=(mp // tile,),
        in_specs=[
            pl.BlockSpec((np_, dp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dp), lambda j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1), lambda j: (0, 0), memory_space=pltpu.SMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32),
        interpret=_interpret(),
    )(xq, yq)
    return total[0, 0] / (n * m)


@jax.custom_vjp
def gaussian_kernel_mean_diff(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Differentiable wrapper around the fused kernel-mean reduction.

    Forward runs the exact Pallas kernel; backward is closed-form:
    with K_ij = exp(-||x_i - y_j||^2 / d^2), m = mean(K),
      dm/dx_i = (-2 / (N M d^2)) (x_i * rowsum(K)_i - (K y)_i)
    computed via two MXU matmuls (no (N, M, d) tensor materialized).
    """
    return gaussian_kernel_mean(x, y)


def _kmd_fwd(x, y):
    return gaussian_kernel_mean(x, y), (x, y)


def _kmd_bwd(res, g):
    x, y = res
    n, d = x.shape
    m = y.shape[0]
    x2 = jnp.sum(jnp.square(x), axis=1, keepdims=True)
    y2 = jnp.sum(jnp.square(y), axis=1, keepdims=True).T
    sq = jnp.maximum(
        x2 + y2 - 2.0 * jnp.dot(x, y.T, preferred_element_type=jnp.float32), 0.0
    )
    K = jnp.exp(-sq / (d * float(d)))
    coef = g * (-2.0 / (n * m * d * float(d)))
    row = jnp.sum(K, axis=1, keepdims=True)
    col = jnp.sum(K, axis=0, keepdims=True).T
    dx = coef * (x * row - jnp.dot(K, y, preferred_element_type=jnp.float32))
    dy = coef * (y * col - jnp.dot(K.T, x, preferred_element_type=jnp.float32))
    return dx, dy


gaussian_kernel_mean_diff.defvjp(_kmd_fwd, _kmd_bwd)


def compute_mmd_pallas(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """MMD(x, y) with all three kernel means fused on device (differentiable)."""
    return (
        gaussian_kernel_mean_diff(x, x)
        + gaussian_kernel_mean_diff(y, y)
        - 2.0 * gaussian_kernel_mean_diff(x, y)
    )


def mmd_loss_pallas(
    key: jax.Array,
    z: jnp.ndarray,
    x_hat: jnp.ndarray,
    x: jnp.ndarray,
    n_prior_samples: int = 200,
) -> jnp.ndarray:
    """Pallas-backed drop-in for ops.losses.mmd_loss (VAE training path)."""
    true_samples = jax.random.normal(key, (n_prior_samples, z.shape[-1]), z.dtype)
    return compute_mmd_pallas(true_samples, z) + jnp.mean(jnp.square(x_hat - x))
