"""Adam with stochastically-rounded bfloat16 parameter storage (pure XLA).

The vmapped HPO trial engine is HBM-bound by optimizer/weight traffic
(bench.py roofline). Storing the Adam moments in bfloat16 (ops/optim.py)
already halves the moment traffic; this optimizer also stores the large
*parameter* leaves (and therefore their gradients) in bfloat16. Plain
round-to-nearest bf16 parameters hurt convergence — updates near the 0.4%
ulp get swallowed (measured +19% val loss at bench shapes) — so the cast
uses **stochastic rounding**: add 16 uniform random bits below the bf16
mantissa cut, then truncate. Rounding becomes unbiased and the parameter
walk tracks the float32 trajectory in expectation (measured val 0.3671 vs
f32's 0.3682 at K=256, 10 epochs).

Why pure XLA and a hash, not a Pallas kernel or jax.random:
* threefry bits (jax.random) cost more than bf16 storage saves — measured
  4.31s vs 3.40s for the round-to-nearest path at K=256;
* a hand-written Pallas update kernel (TPU hardware PRNG +
  pltpu.stochastic_round) plateaued at 342 GB/s while XLA runs the same
  fused elementwise chain at ~620 GB/s — block size, grid semantics, and
  dropping the PRNG/divisions did not move it, so the ceiling is the
  pallas_call itself, not the math;
* a murmur-style integer hash over the element index is ~10 VPU ops per
  element and fuses into the update chain for free: measured 3.51 ms/step
  vs 3.52 for round-to-nearest at K=256 x 4736 x 128, with rounding bias
  < 2e-6.

Per element per step this moves 2(p)+2(m)+2(v)+2(g) bytes read + 6 bytes
written, vs 12+12 for the float32-state optax chain — and the same code
runs identically (and deterministically) on CPU for tests.

``moment_dtype="int8"`` (sr_adam_init) additionally stores the big leaves'
moments in 8 bits with per-row (last-axis) float32 scales: m as linear
int8 with stochastic rounding (unbiased; the EMA re-accumulates fresh
gradient each step so stale quant noise decays geometrically), v as an
8-bit LOG encoding (8 steps/octave over 32 octaves below the row max —
v's within-row dynamic range makes linear int8 useless, and elements
quantized to zero would explode m/(sqrt(v)+eps); the log floor decodes to
~4e-10x the row max, below Adam's eps exactly where float32 underflow
lands too). Traffic drops to 2+1+1+2 read + 4 written (+8/row of scale),
~1.4x on paper on the moment-bound engines.

**Measured verdict (tools/measure_q8_moments.py, real v5e, K=512): keep
bf16 moments.** Numerics are excellent (lr-ranking Spearman 0.9994 vs
bf16, median val-loss delta 0.0015) but throughput HALVES (0.52x; m-only
"int8_m" with no transcendentals still 0.57x): the per-row absmax scale
is a data-dependent reduction that breaks XLA's single-pass fused update
chain — m32 materializes in f32, then the quantized write is a second
pass, ADDING traffic instead of saving it. Same ceiling as the Pallas
update kernel (module note above): on XLA/TPU the fused bf16 chain is
the floor. int8 stays available as an opt-in for HBM-capacity-starved
configs, not as a speed lever.

No reference analog (the reference trains trials sequentially with
torch.optim.Adam — main.py:352-398); this is a TPU-bandwidth optimization
of the trial fan-out engine. The single-model Trainer keeps float32.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

SR_MIN_SIZE = 65536  # leaves below this stay float32 (sensitivity + no win)
_P1 = jnp.uint32(2654435761)
_P2 = jnp.uint32(2246822519)
_P3 = jnp.uint32(3266489917)


def hash_bits(shape, seed):
    """Per-element uint32 hash (murmur-style finalizer over the flat index).

    Statistical quality is ample for rounding decisions; it is NOT a
    cryptographic or stream-safe PRNG. ``seed`` must differ per step (and
    per trial / per leaf) — the caller mixes those in.
    """
    idx = jnp.zeros(shape, jnp.uint32)
    stride = jnp.uint32(1)
    for ax in range(len(shape) - 1, -1, -1):
        idx = idx + jax.lax.broadcasted_iota(jnp.uint32, shape, ax) * stride
        stride = stride * jnp.uint32(shape[ax])
    h = (idx + seed.astype(jnp.uint32)) * _P1
    h = h ^ (h >> 16)
    h = h * _P2
    h = h ^ (h >> 13)
    h = h * _P3
    h = h ^ (h >> 16)
    return h


def sr_bf16(x32, seed):
    """Stochastic-round float32 -> bfloat16 (unbiased; ~free under fusion)."""
    bits = hash_bits(x32.shape, seed)
    xi = jax.lax.bitcast_convert_type(x32, jnp.uint32)
    yi = (xi + (bits & jnp.uint32(0xFFFF))) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(yi, jnp.float32).astype(jnp.bfloat16)


def _u01(shape, seed):
    """Per-element uniform [0,1) from the hash (24-bit resolution)."""
    return (hash_bits(shape, seed) >> 8).astype(jnp.float32) * jnp.float32(
        2.0 ** -24
    )


def q8_encode_m(m32, seed):
    """First moment -> int8 with a per-row (last-axis) absmax scale.

    Linear symmetric quantization with stochastic rounding: unbiased, and
    the EMA re-accumulates fresh gradient every step so stale quantization
    noise decays geometrically (stationary error std ~= absmax/110).
    Clipping happens AFTER the dither so in-range values round without
    bias; only values pushed past +/-127 by float error in 127/s (the
    scale is the row absmax, so nothing sits truly out of range) saturate.
    """
    s = jnp.maximum(jnp.max(jnp.abs(m32), axis=-1, keepdims=True), 1e-30)
    x = m32 * (127.0 / s)
    q = jnp.clip(
        jnp.floor(x + _u01(m32.shape, seed)), -127.0, 127.0
    ).astype(jnp.int8)
    return {"q": q, "s": s}


def q8_decode_m(d):
    return d["q"].astype(jnp.float32) * (d["s"] * jnp.float32(1.0 / 127.0))


def q8_encode_v(v32, seed):
    """Second moment -> 8-bit LOG encoding with a per-row absmax scale.

    v's within-row dynamic range spans far too many octaves for linear
    int8 (elements quantized to 0 would explode m/(sqrt(v)+eps)), so store
    octaves-below-row-max of sqrt(v) at 8 steps/octave: 32 octaves of
    range, <=4.4% error in the Adam denominator before stochastic
    rounding. q=255 decodes to sqrt(v) ~= 4e-10 * s, far below eps for any
    realistic scale — exactly where float32 Adam's eps takes over anyway.
    """
    r = jnp.sqrt(v32)
    s = jnp.maximum(jnp.max(r, axis=-1, keepdims=True), 1e-30)
    e = jnp.maximum(-8.0 * jnp.log2(jnp.maximum(r / s, 2.0 ** -40)), 0.0)
    q = jnp.minimum(
        jnp.floor(e + _u01(v32.shape, seed)), 255.0
    ).astype(jnp.uint8)
    return {"q": q, "s": s}


def q8_decode_v(d):
    r = d["s"] * jnp.exp2(d["q"].astype(jnp.float32) * jnp.float32(-0.125))
    return r * r


def _is_q8(leaf) -> bool:
    return isinstance(leaf, dict) and "q" in leaf and "s" in leaf


def cast_params_for_sr(params):
    """Large leaves -> bfloat16 storage; small leaves stay float32."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.size >= SR_MIN_SIZE else a,
        params,
    )


def cast_stacked_params_for_sr(params, k):
    """Same, for a K-stacked pytree — the size threshold applies to the
    per-trial leaf, not the stacked array."""
    return jax.tree.map(
        lambda a: a.astype(jnp.bfloat16)
        if a.size // k >= SR_MIN_SIZE else a,
        params,
    )


def trial_update_step(params, opt_state, grads, lr, rng, *, sr, tx,
                      mask=None):
    """One optimizer step shared by both trial engines (ParallelTrials and
    vmapped_grid_fit): SR-Adam when ``sr`` else the optax chain, with the
    per-trial lr (and optional update mask) applied outside the transform.
    Returns (params', opt_state', rng')."""
    import optax

    if sr:
        rng, sr_rng = jax.random.split(rng)
        seed32 = jax.random.bits(sr_rng, (), jnp.uint32)
        params, opt_state = sr_adam_step(
            params, opt_state, grads, lr, seed32, masks=mask
        )
    else:
        # mask the gradients BEFORE the optax chain so the global-norm
        # clip sees only trainable/real parameters (reference parity:
        # requires_grad=False params contribute nothing to the norm)
        if mask is not None:
            grads = jax.tree.map(lambda g, m: g * m, grads, mask)
        updates, opt_state = tx.update(grads, opt_state, params)
        if mask is None:
            updates = jax.tree.map(lambda u: -lr * u, updates)
        else:
            updates = jax.tree.map(lambda u, m: -lr * u * m, updates, mask)
        params = optax.apply_updates(params, updates)
    return params, opt_state, rng


def sr_adam_init(params, moment_dtype: str = "mirror"):
    """(m, v, count).

    ``moment_dtype="mirror"`` (default): moment dtype mirrors each param
    leaf's dtype (bf16 for the big SR-stored leaves). ``"int8"``: the big
    (bf16) leaves store block-scaled 8-bit moments instead — int8 linear
    for m, log8 for v (q8_encode_*), halving the remaining moment traffic
    on the HBM-bound trial engines; small float32 leaves keep float32
    moments either way.
    """
    zeros = lambda a: jnp.zeros(a.shape, a.dtype)
    if moment_dtype not in ("int8", "int8_m"):
        return (jax.tree.map(zeros, params), jax.tree.map(zeros, params),
                jnp.zeros((), jnp.uint32))

    def init_m(a):
        if a.dtype != jnp.bfloat16:
            return zeros(a)
        return {
            "q": jnp.zeros(a.shape, jnp.int8),
            "s": jnp.full(a.shape[:-1] + (1,), 1e-30, jnp.float32),
        }

    def init_v(a):
        if a.dtype != jnp.bfloat16:
            return zeros(a)
        # q=255 at the floor scale decodes to ~0 (see q8_encode_v)
        return {
            "q": jnp.full(a.shape, 255, jnp.uint8),
            "s": jnp.full(a.shape[:-1] + (1,), 1e-30, jnp.float32),
        }

    # "int8_m": quantize only the first moment (linear int8 — no
    # transcendentals); v keeps the mirrored bf16 storage
    init_v_eff = init_v if moment_dtype == "int8" else zeros
    return (jax.tree.map(init_m, params), jax.tree.map(init_v_eff, params),
            jnp.zeros((), jnp.uint32))


def global_norm_f32(tree):
    """Float32 global L2 norm of a pytree (bf16-leaf-safe)."""
    return jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32)))
        for x in jax.tree.leaves(tree)
    ))


def sr_adam_step(params, state, grads, lr, seed, *, masks=None,
                 grad_clip: float = 1.0,
                 b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One Adam step over a mixed bf16/f32 param pytree; math in float32,
    bf16 leaves re-stored with stochastic rounding.

    ``lr`` may be a traced scalar (per-trial under vmap); ``seed`` is a
    traced uint32 scalar that must differ per step and per trial.
    Global-norm clipping (reference parity: clip 1.0 before Adam) folds in
    as a scalar gradient scale. ``masks`` (optional pytree of scalar or
    element 0/1 masks, as in the heterogeneous-trial engine) multiplies
    the update; exactly-zero masked parameters stay exactly zero under SR
    (adding sub-ulp bits to +0.0 truncates back to +0.0).
    Returns (params', state').
    """
    m, v, count = state
    count = count + jnp.uint32(1)
    c = count.astype(jnp.float32)
    b1c = 1.0 - b1**c
    b2c = 1.0 - b2**c

    leaves_p, treedef = jax.tree.flatten(params)
    leaves_m = jax.tree.flatten(m, is_leaf=_is_q8)[0]
    leaves_v = jax.tree.flatten(v, is_leaf=_is_q8)[0]
    leaves_g = jax.tree.leaves(grads)
    leaves_k = (jax.tree.leaves(masks) if masks is not None
                else [None] * len(leaves_p))
    # mask BEFORE the clip norm: frozen (fine-tuner) and padded (hetero)
    # parameters must not inflate the global norm — the reference clips
    # only requires_grad params, and a padded trial's norm must equal its
    # small architecture's
    if masks is not None:
        leaves_g = [
            (lg if lk is None else lg * lk)
            for lg, lk in zip(leaves_g, leaves_k)
        ]
    gnorm = jnp.sqrt(sum(
        jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves_g
    ))
    gscale = jnp.minimum(1.0, grad_clip / (gnorm + 1e-12))

    new_p, new_m, new_v = [], [], []
    for i, (lp, lm, lv, lg, lk) in enumerate(
        zip(leaves_p, leaves_m, leaves_v, leaves_g, leaves_k)
    ):
        g32 = lg.astype(jnp.float32) * gscale
        m_prev = q8_decode_m(lm) if _is_q8(lm) else lm.astype(jnp.float32)
        v_prev = q8_decode_v(lv) if _is_q8(lv) else lv.astype(jnp.float32)
        m32 = b1 * m_prev + (1.0 - b1) * g32
        v32 = b2 * v_prev + (1.0 - b2) * g32 * g32
        u = (m32 / b1c) / (jnp.sqrt(v32 / b2c) + eps)
        if lk is not None:
            u = u * lk
        p32 = lp.astype(jnp.float32) - lr * u
        leaf_seed = seed + jnp.uint32(i) * _P2 + count * _P3
        if lp.dtype == jnp.bfloat16:
            new_p.append(sr_bf16(p32, leaf_seed))
        else:
            new_p.append(p32.astype(lp.dtype))
        new_m.append(
            q8_encode_m(m32, leaf_seed * _P1 + jnp.uint32(0x9E3779B9))
            if _is_q8(lm) else m32.astype(lm.dtype)
        )
        new_v.append(
            q8_encode_v(v32, leaf_seed * _P3 + jnp.uint32(0x85EBCA77))
            if _is_q8(lv) else v32.astype(lv.dtype)
        )
    unflat = lambda ls: jax.tree.unflatten(treedef, ls)
    return unflat(new_p), (unflat(new_m), unflat(new_v), count)
