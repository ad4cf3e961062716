"""Pallas TPU kernel: fused Linear -> BatchNorm -> ReLU (-> Dropout).

This is the hot block of every encoder/head in the model zoo (reference
modules.py:106-150 runs it as 4 separate torch ops). The fusion computes the
GEMM tile, batch statistics, normalization, activation and dropout masking in
one VMEM-resident pass — the (B, H) activation never round-trips to HBM
between ops.

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
    x_ref, w_ref, b_ref, gamma_ref, beta_ref, seed_ref,
    y_ref, h_ref, mean_ref, var_ref,
    *, eps: float, dropout_rate: float, n_valid_h: int, n_valid_b: int,
):
    j = pl.program_id(0)
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
    y = jnp.maximum(y, 0.0)
    if dropout_rate > 0.0:
        pltpu.prng_seed(seed_ref[0] + j)
        bits = pltpu.prng_random_bits(y.shape)
        # uniform in [0, 1) from the high 24 bits
        u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
        keep = (u >= dropout_rate).astype(jnp.float32)
        y = y * keep * (1.0 / (1.0 - dropout_rate))
    y_ref[:] = y
    h_ref[:] = h
    mean_ref[:] = mu
    var_ref[:] = var


def _fused_forward(x, w, b, gamma, beta, seed, eps, dropout_rate):
    B, F = x.shape
    H = w.shape[1]
    # the in-kernel TPU PRNG has no CPU interpreter lowering; apply dropout
    # outside the kernel when interpreting (tests) — masks differ by backend
    # but both are valid inverted-dropout draws
    host_dropout = dropout_rate > 0.0 and _interpret()
    kernel_dropout = 0.0 if host_dropout else dropout_rate
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
        if dropout_rate > 0.0:
            keep = jax.random.bernoulli(
                jax.random.key(jnp.asarray(seed, jnp.int32)),
                1.0 - dropout_rate, y.shape,
            ).astype(y.dtype)
            y = y * keep * (1.0 / (1.0 - dropout_rate))
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
    seed = jnp.asarray(seed, jnp.int32).reshape(1)
    kernel = functools.partial(
        _fused_fwd_kernel,
        eps=eps,
        dropout_rate=kernel_dropout,
        n_valid_h=H,
        n_valid_b=B,
    )
    y, h, mu, var = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((Bp, Fp), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Fp, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile), lambda j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
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
    )(x, w, b2, gamma2, beta2, seed)
    y = y[:B, :H]
    if host_dropout:
        keep = jax.random.bernoulli(
            jax.random.key(seed[0]), 1.0 - dropout_rate, y.shape
        ).astype(y.dtype)
        y = y * keep * (1.0 / (1.0 - dropout_rate))
    return y, h[:B, :H], mu[0, :H], var[0, :H]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7))
def fused_linear_bn_relu(x, w, b, gamma, beta, seed=0, eps=1e-5,
                         dropout_rate=0.0):
    """relu(batchnorm(x @ w + b)) (+ inverted dropout), fused on TPU.

    ``seed`` may be a traced int32 scalar (it flows into the kernel as data).
    Returns (y, batch_mean, batch_var) — the caller folds mean/var into its
    running statistics (torch momentum-0.1 convention handled by the module).
    """
    y, _, mu, var = _fused_forward(x, w, b, gamma, beta, seed, eps, dropout_rate)
    return y, mu, var


def _fwd(x, w, b, gamma, beta, seed, eps, dropout_rate):
    y, h, mu, var = _fused_forward(x, w, b, gamma, beta, seed, eps, dropout_rate)
    return (y, mu, var), (x, w, gamma, beta, h, mu, var, y)


def _bwd(eps, dropout_rate, res, grads):
    x, w, gamma, beta, h, mu, var, y = res
    gy, _, _ = grads
    B = x.shape[0]
    inv = jax.lax.rsqrt(var + eps)
    hn = (h - mu) * inv
    relu_in = hn * gamma + beta
    act_mask = (relu_in > 0).astype(gy.dtype)
    if dropout_rate > 0.0:
        # dropout mask is recoverable from y: kept units have y != 0 when the
        # relu output was > 0; combine with act_mask (dropped -> y == 0)
        drop_mask = (y != 0).astype(gy.dtype)
        g = gy * drop_mask * (1.0 / (1.0 - dropout_rate)) * act_mask
    else:
        g = gy * act_mask
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
    import numpy as _np

    dseed = _np.zeros((), jax.dtypes.float0)  # integer seed: symbolic zero
    return dx, dw, db, dgamma, dbeta, dseed


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
