"""Pallas TPU kernel: fused Linear -> BatchNorm -> ReLU.

This is the hot block of every encoder/head in the model zoo (reference
modules.py:106-150 runs it as 4 separate torch ops). The fusion computes the
GEMM tile, batch statistics, normalization and activation in one
VMEM-resident pass — the (B, H) activation never round-trips to HBM
between ops. Dropout deliberately stays OUTSIDE the kernel (the caller
applies ``nn.Dropout`` on the output, exactly like the unfused MLP): an
in-kernel PRNG needs a per-call seed operand, and a scalar SMEM operand
has no legal block shape under ``vmap`` — the trial engine vmaps every
model over the trial axis, so a seeded kernel cannot run where it matters
most. XLA fuses the mask-multiply into the kernel's consumer anyway.

Grid: one program per hidden-dim tile. Each program sees the full batch
(clinical batches are 32..128 rows — far below VMEM limits), so per-column
batch statistics are exact within the kernel. Shapes whose blocks exceed
the VMEM budget (production-scale single models, e.g. batch 1024 x 16k
features) fall back to identical unfused math — those GEMMs are MXU-bound
and XLA's fusion already hides the elementwise chain, so the kernel's win
only exists at the small memory-bound shapes it was built for.

Backward: custom VJP with a pure-XLA backward (the two backward GEMMs hit
the MXU through XLA; only the memory-bound forward chain benefits from
manual fusion).

On non-TPU backends the kernel runs in interpret mode (slow, tests only).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 256
# the block design keeps the full (batch x features) input tile VMEM-
# resident (exact per-column batch stats in one pass); beyond this budget
# fall back to identical unfused math — at such shapes the GEMM is
# MXU-bound and XLA's own fusion already hides the BN/elementwise chain
# (measured: BN round-trip ~6% of GEMM time at B=1024, F=16k)
_VMEM_BUDGET_BYTES = 12 * 2**20


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _exceeds_vmem(Bp: int, Fp: int, tile: int) -> bool:
    words = Bp * Fp + Fp * tile + 2 * Bp * tile + 4 * tile
    return words * 4 > _VMEM_BUDGET_BYTES


def _fused_fwd_kernel(
    x_ref, w_ref, b_ref, gamma_ref, beta_ref,
    y_ref, h_ref, mean_ref, var_ref,
    *, eps: float, n_valid_b: int,
):
    h = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
    h = h + b_ref[:]
    # batch statistics over the VALID rows only (batch axis may be padded to
    # the 8-sublane tile; padded rows hold the bias and must not contribute)
    row_ok = (
        jax.lax.broadcasted_iota(jnp.int32, h.shape, 0) < n_valid_b
    ).astype(h.dtype)
    inv_n = 1.0 / n_valid_b
    mu = jnp.sum(h * row_ok, axis=0, keepdims=True) * inv_n
    centered = (h - mu) * row_ok
    var = jnp.sum(jnp.square(centered), axis=0, keepdims=True) * inv_n
    inv = jax.lax.rsqrt(var + eps)
    y = centered * inv * gamma_ref[:] + beta_ref[:]
    y_ref[:] = jnp.maximum(y, 0.0)
    h_ref[:] = h
    mean_ref[:] = mu
    var_ref[:] = var


def _fused_forward(x, w, b, gamma, beta, eps):
    B, F = x.shape
    H = w.shape[1]
    # pad every dimension to the hardware tiles (8 sublanes x 128 lanes) —
    # Mosaic miscompiles unaligned contraction dims instead of erroring
    Bp = _round_up(B, 8)
    Fp = _round_up(F, 128)
    # H pads to a multiple of the column tile so the grid covers every tile
    tile = min(TILE_H, _round_up(H, 128))
    Hp = _round_up(H, tile)
    if _exceeds_vmem(Bp, Fp, tile):
        # identical math, unfused (see _VMEM_BUDGET_BYTES note)
        h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        mu = jnp.mean(h, axis=0)
        var = jnp.mean(jnp.square(h - mu), axis=0)
        y = jnp.maximum(
            (h - mu) * jax.lax.rsqrt(var + eps) * gamma + beta, 0.0
        )
        return y, h, mu, var
    if (Bp, Fp) != (B, F):
        x = jnp.pad(x, ((0, Bp - B), (0, Fp - F)))
    if (Fp, Hp) != (F, H):
        w = jnp.pad(w, ((0, Fp - F), (0, Hp - H)))
    if Hp != H:
        b = jnp.pad(b, (0, Hp - H))
        gamma = jnp.pad(gamma, (0, Hp - H), constant_values=1.0)
        beta = jnp.pad(beta, (0, Hp - H))
    grid = (Hp // tile,)
    b2 = b.reshape(1, Hp)
    gamma2 = gamma.reshape(1, Hp)
    beta2 = beta.reshape(1, Hp)
    kernel = functools.partial(_fused_fwd_kernel, eps=eps, n_valid_b=B)
    y, h, mu, var = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bp, Fp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Bp, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((Bp, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
            jax.ShapeDtypeStruct((1, Hp), jnp.float32),
            jax.ShapeDtypeStruct((1, Hp), jnp.float32),
        ],
        interpret=_interpret(),
    )(x, w, b2, gamma2, beta2)
    return y[:B, :H], h[:B, :H], mu[0, :H], var[0, :H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def fused_linear_bn_relu(x, w, b, gamma, beta, eps=1e-5):
    """relu(batchnorm(x @ w + b)), fused on TPU.

    Returns (y, batch_mean, batch_var) — the caller folds mean/var into its
    running statistics (torch momentum-0.1 convention handled by the module)
    and applies dropout on y (see module docstring for why dropout lives
    outside the kernel).
    """
    y, _, mu, var = _fused_forward(x, w, b, gamma, beta, eps)
    return y, mu, var


def _fwd(x, w, b, gamma, beta, eps):
    y, h, mu, var = _fused_forward(x, w, b, gamma, beta, eps)
    return (y, mu, var), (x, w, gamma, beta, h, mu, var)


def _bwd(eps, res, grads):
    x, w, gamma, beta, h, mu, var = res
    gy, _, _ = grads
    inv = jax.lax.rsqrt(var + eps)
    hn = (h - mu) * inv
    relu_in = hn * gamma + beta
    g = gy * (relu_in > 0).astype(gy.dtype)
    dgamma = jnp.sum(g * hn, axis=0)
    dbeta = jnp.sum(g, axis=0)
    # batchnorm backward (batch statistics)
    ghn = g * gamma
    dh = (
        ghn
        - jnp.mean(ghn, axis=0, keepdims=True)
        - hn * jnp.mean(ghn * hn, axis=0, keepdims=True)
    ) * inv
    dx = jnp.dot(dh, w.T, preferred_element_type=jnp.float32)
    dw = jnp.dot(x.T, dh, preferred_element_type=jnp.float32)
    db = jnp.sum(dh, axis=0)
    return dx, dw, db, dgamma, dbeta


fused_linear_bn_relu.defvjp(_fwd, _bwd)


def fused_linear_bn_relu_eval(x, w, b, gamma, beta, running_mean, running_var,
                              eps: float = 1e-5):
    """Inference-mode fused block using running statistics (no dropout)."""
    B, F = x.shape
    H = w.shape[1]
    Bp = _round_up(B, 8)
    Fp = _round_up(F, 128)
    tile = min(TILE_H, _round_up(H, 128))
    Hp = _round_up(H, tile)
    if _exceeds_vmem(Bp, Fp, tile):
        # identical math, unfused (see _VMEM_BUDGET_BYTES note)
        h = jnp.dot(x, w, preferred_element_type=jnp.float32) + b
        inv = jax.lax.rsqrt(running_var + eps)
        return jnp.maximum((h - running_mean) * inv * gamma + beta, 0.0)
    if (Bp, Fp) != (B, F):
        x = jnp.pad(x, ((0, Bp - B), (0, Fp - F)))
    if (Fp, Hp) != (F, H):
        w = jnp.pad(w, ((0, Fp - F), (0, Hp - H)))
    if Hp != H:
        b = jnp.pad(b, (0, Hp - H))
        gamma = jnp.pad(gamma, (0, Hp - H), constant_values=1.0)
        beta = jnp.pad(beta, (0, Hp - H))
        running_mean = jnp.pad(running_mean, (0, Hp - H))
        running_var = jnp.pad(running_var, (0, Hp - H), constant_values=1.0)
    b2 = b.reshape(1, Hp)
    gamma2 = gamma.reshape(1, Hp)
    beta2 = beta.reshape(1, Hp)
    rm2 = running_mean.reshape(1, Hp)
    rv2 = running_var.reshape(1, Hp)

    def kernel(x_ref, w_ref, b_ref, g_ref, be_ref, rm_ref, rv_ref, y_ref):
        h = jnp.dot(x_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        h = h + b_ref[:]
        inv = jax.lax.rsqrt(rv_ref[:] + eps)
        y = (h - rm_ref[:]) * inv * g_ref[:] + be_ref[:]
        y_ref[:] = jnp.maximum(y, 0.0)

    vec = lambda j: (0, j)
    y = pl.pallas_call(
        kernel,
        grid=(Hp // tile,),
        in_specs=[
            pl.BlockSpec((Bp, Fp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), vec, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), vec, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (Bp, tile), lambda j: (0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((Bp, Hp), jnp.float32),
        interpret=_interpret(),
    )(x, w, b2, gamma2, beta2, rm2, rv2)
    return y[:B, :H]
