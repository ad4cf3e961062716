"""Parameter initializers matching the reference's PyTorch init semantics.

The reference (flexynesis @ /root/reference) relies on two init schemes:

* ``nn.Linear`` default init (used by ``MLP`` — modules.py:106-150):
  kaiming_uniform(a=sqrt(5)) on the weight, which collapses to
  U(-1/sqrt(fan_in), +1/sqrt(fan_in)); bias likewise U(+-1/sqrt(fan_in)).
* ``nn.init.xavier_uniform_`` on weights of ``Encoder``/``Decoder``
  stacks (modules.py:26,32,39,41,77,89) with the default torch bias init.

We reproduce both so that distributions of freshly initialized parameters
match the reference (exact values differ — RNG streams differ by design).
Flax kernels are (fan_in, fan_out), i.e. transposed w.r.t. torch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)) — torch nn.Linear default weight init."""
    fan_in = shape[0]
    bound = 1.0 / jnp.sqrt(jnp.asarray(fan_in, dtype=jnp.float32))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def make_torch_bias_init(fan_in: int):
    """torch nn.Linear default bias init: U(+-1/sqrt(fan_in)).

    Flax bias initializers only see the bias shape, not fan_in, so fan_in is
    bound at module-construction time.
    """
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


xavier_uniform = jax.nn.initializers.xavier_uniform()
