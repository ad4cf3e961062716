"""Low-precision-state Adam for the vmapped trial engines.

The parallel-trials roofline (bench.py module docstring) shows the K-trial
HPO path is HBM-bandwidth-bound, with Adam moment-state read+write traffic
alone ~half the per-step bytes. Storing the moments in bfloat16 halves that
traffic; accumulation still happens in float32 every step — only the
*stored* state is rounded (<=0.4% relative), so the EMA keeps float32
dynamics.

No reference analog (the reference trains trials sequentially with
torch.optim.Adam — main.py:352-398); this is a TPU-bandwidth optimization
of the trial fan-out engine. The single-model Trainer keeps float32 state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def scale_by_adam_lowp(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    state_dtype=jnp.bfloat16,
) -> optax.GradientTransformation:
    """optax.scale_by_adam with moments stored in ``state_dtype``.

    With ``state_dtype=jnp.float32`` this reproduces optax.scale_by_adam
    exactly (golden-tested); with bfloat16 it halves optimizer HBM traffic.
    """

    def init_fn(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=state_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        b1c = 1.0 - b1**c
        b2c = 1.0 - b2**c
        mu32 = jax.tree.map(
            lambda g, m: b1 * m.astype(jnp.float32) + (1.0 - b1) * g,
            updates, state.mu,
        )
        nu32 = jax.tree.map(
            lambda g, v: b2 * v.astype(jnp.float32) + (1.0 - b2) * (g * g),
            updates, state.nu,
        )
        new_updates = jax.tree.map(
            lambda m, v: (m / b1c) / (jnp.sqrt(v / b2c) + eps), mu32, nu32
        )
        to_state = lambda t: jax.tree.map(
            lambda x: x.astype(state_dtype), t
        )
        return new_updates, optax.ScaleByAdamState(
            count=count, mu=to_state(mu32), nu=to_state(nu32)
        )

    return optax.GradientTransformation(init_fn, update_fn)


def trial_optimizer(moment_dtype: str = "bfloat16") -> optax.GradientTransformation:
    """The shared trial-engine transform: global-norm clip 1.0 + Adam scaling
    (lr applied outside, per trial). ``moment_dtype`` selects the stored
    moment precision; "float32" falls back to stock optax."""
    if moment_dtype in (None, "float32"):
        adam = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    elif moment_dtype in ("int8", "int8_m"):
        # block-scaled int8 moments exist only inside the SR engine
        # (ops/sr_adam.py q8_encode_*); this optax chain is the non-SR
        # fallback and stores bfloat16 there
        adam = scale_by_adam_lowp(state_dtype=jnp.bfloat16)
    else:
        adam = scale_by_adam_lowp(state_dtype=jnp.dtype(moment_dtype))
    return optax.chain(optax.clip_by_global_norm(1.0), adam)
