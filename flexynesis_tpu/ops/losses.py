"""Masked, static-shape, jit-compatible losses.

The reference handles missing labels with boolean indexing (dynamic shapes,
e.g. models/direct_pred.py:165-189 and modules.py:277-300). Under XLA every
loss here is recast as a fixed-shape masked computation so a single compiled
program serves every batch:

* ``masked_mse_loss``   — reference direct_pred.py:165-177 (NaN targets masked)
* ``masked_ce_loss``    — reference direct_pred.py:179-189 (-1 / NaN masked)
* ``cox_ph_loss``       — reference modules.py:265-305 (negative Cox partial
                          log-likelihood; invalid rows sorted last and zeroed)
* ``compute_total_loss``— reference direct_pred.py:192-223 (Kendall et al.
                          uncertainty weighting: sum exp(-s)*L + s)
* ``mmd_loss``          — reference supervised_vae.py:494-550 (Gaussian-kernel
                          MMD against 200 N(0, I) prior draws + recon MSE)
* ``triplet_margin_loss``— reference triplet_encoder.py:178-194
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


def masked_mse_loss(y_hat: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """MSE over entries whose target is not NaN; 0.0 when nothing is valid."""
    y_hat = jnp.reshape(y_hat, (-1,))
    y = jnp.reshape(y, (-1,)).astype(y_hat.dtype)
    valid = jnp.isfinite(y)
    y_safe = jnp.where(valid, y, 0.0)
    sq = jnp.square(y_hat - y_safe) * valid
    n = jnp.sum(valid)
    return jnp.where(n > 0, jnp.sum(sq) / jnp.maximum(n, 1), 0.0)


def masked_ce_loss(logits: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Cross entropy ignoring targets encoded as -1 (or NaN); 0.0 if all missing."""
    y = jnp.reshape(y, (-1,)).astype(jnp.float32)
    valid = (y != -1) & jnp.isfinite(y)
    y_idx = jnp.where(valid, y, 0).astype(jnp.int32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(log_probs, y_idx[:, None], axis=-1)[:, 0]
    nll = nll * valid
    n = jnp.sum(valid)
    return jnp.where(n > 0, jnp.sum(nll) / jnp.maximum(n, 1), 0.0)


def cox_ph_loss(
    outputs: jnp.ndarray, durations: jnp.ndarray, events: jnp.ndarray
) -> jnp.ndarray:
    """Negative Cox partial log-likelihood, NaN-masked and static-shape.

    Rows with NaN duration/event are pushed to the end of the descending-time
    sort and contribute zero hazard, reproducing the reference's filtering
    (modules.py:277-300) without dynamic shapes. Non-finite results fall back
    to 0.0 exactly as the reference's guard does (modules.py:303-304).
    """
    outputs = jnp.reshape(outputs, (-1,)).astype(jnp.float32)
    durations = jnp.reshape(durations, (-1,)).astype(jnp.float32)
    events = jnp.reshape(events, (-1,)).astype(jnp.float32)

    # non-finite model outputs join the invalid mask: the reference's guard
    # (modules.py:303-304) returns a fresh detached 0.0 in that case, i.e.
    # zero gradients — masking the rows reproduces that without NaNs ever
    # entering the graph (a where() AFTER the fact fixes only the forward
    # value; cotangents of log/exp at the bad rows would still be NaN and
    # poison every parameter)
    valid = (
        jnp.isfinite(durations) & jnp.isfinite(events) & jnp.isfinite(outputs)
    )
    # invalid rows -> -inf duration so they sort last in descending order
    d_sortkey = jnp.where(valid, durations, -jnp.inf)
    order = jnp.argsort(-d_sortkey)

    valid_sorted = valid[order]
    # double-where: bad rows are zeroed BEFORE any exp/log touches them
    out_sorted = jnp.where(valid_sorted, outputs[order], 0.0)
    events_sorted = jnp.where(valid_sorted, events[order], 0.0)

    # stabilized log-cumsum-exp of risk over the descending-time order
    m = jnp.max(jnp.where(valid_sorted, out_sorted, -jnp.inf))
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    hazards = jnp.exp(out_sorted - m) * valid_sorted
    # clamp the cumsum away from 0 (all-invalid prefix, or a first hazard
    # that underflowed): max(., tiny) routes the gradient to the constant
    # branch at clamped positions instead of producing 0/0
    csum = jnp.maximum(jnp.cumsum(hazards), jnp.finfo(jnp.float32).tiny)
    log_risk_set = jnp.log(csum) + m

    uncensored = jnp.sum(events_sorted * (out_sorted - log_risk_set))
    n_events = jnp.sum(jnp.where(valid, events, 0.0))
    loss = -uncensored / jnp.maximum(n_events, 1.0)
    loss = jnp.where(n_events > 0, loss, 0.0)
    return jnp.where(jnp.isfinite(loss), loss, 0.0)


def compute_total_loss(
    losses: Dict[str, jnp.ndarray],
    log_vars: Optional[Dict[str, jnp.ndarray]] = None,
    use_loss_weighting: bool = True,
) -> jnp.ndarray:
    """Uncertainty-weighted (or plain) sum of per-variable losses.

    Reference direct_pred.py:192-223: when weighting is on and there is more
    than one loss, total = sum_i exp(-s_i) * L_i + s_i with learnable s_i.
    """
    if use_loss_weighting and log_vars is not None and len(losses) > 1:
        total = 0.0
        for name, loss in losses.items():
            s = jnp.reshape(log_vars[name], ())
            total = total + jnp.exp(-s) * loss + s
        return jnp.asarray(total)
    return jnp.asarray(sum(losses.values()))


def gaussian_kernel(
    x: jnp.ndarray, y: jnp.ndarray, divisor=None
) -> jnp.ndarray:
    """exp(-mean((x_i - y_j)^2) / dim) pairwise kernel (supervised_vae.py:494-518).

    Computed via the ||x||^2 + ||y||^2 - 2 x.y expansion so the O(B^2 d) work
    runs as one MXU matmul instead of materializing (B, B, d) differences.
    ``divisor`` overrides the static dim^2 denominator — the padded-trial
    masked variant passes the TRIAL's (traced) latent_dim^2 so the padded
    network computes the smaller architecture's exact kernel.
    """
    dim = x.shape[-1]
    x2 = jnp.sum(jnp.square(x), axis=-1, keepdims=True)  # (nx, 1)
    y2 = jnp.sum(jnp.square(y), axis=-1, keepdims=True).T  # (1, ny)
    xy = jnp.dot(x, y.T, preferred_element_type=jnp.float32)
    sq = jnp.maximum(x2 + y2 - 2.0 * xy, 0.0)
    d2 = (dim * float(dim)) if divisor is None else divisor
    return jnp.exp(-sq / d2)


def compute_mmd(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Maximum mean discrepancy between two sample sets (supervised_vae.py:520-530)."""
    return (
        jnp.mean(gaussian_kernel(x, x))
        + jnp.mean(gaussian_kernel(y, y))
        - 2.0 * jnp.mean(gaussian_kernel(x, y))
    )


def mmd_loss(
    key: jax.Array,
    z: jnp.ndarray,
    x_hat: jnp.ndarray,
    x: jnp.ndarray,
    n_prior_samples: int = 200,
) -> jnp.ndarray:
    """MMD(z, N(0,I) prior draws) + reconstruction MSE (supervised_vae.py:532-550)."""
    true_samples = jax.random.normal(key, (n_prior_samples, z.shape[-1]), z.dtype)
    return compute_mmd(true_samples, z) + jnp.mean(jnp.square(x_hat - x))


def masked_mmd_loss(
    key: jax.Array,
    z: jnp.ndarray,
    x_hat: jnp.ndarray,
    x: jnp.ndarray,
    latent_mask: jnp.ndarray,
    latent_dim: jnp.ndarray,
    n_prior_samples: int = 200,
) -> jnp.ndarray:
    """MMD + recon loss restricted to the first ``latent_dim`` latent dims.

    Used by heterogeneous-trial padding (parallel/hetero.py): a padded VAE
    carries zeros in latent dims >= latent_dim; masking the prior draws and
    dividing the kernel by the TRIAL's latent_dim^2 makes this loss exactly
    the smaller architecture's mmd_loss.
    """
    true_samples = (
        jax.random.normal(key, (n_prior_samples, z.shape[-1]), z.dtype)
        * latent_mask
    )
    zm = z * latent_mask
    d2 = latent_dim.astype(jnp.float32) ** 2

    def kmean(a, b):
        return jnp.mean(gaussian_kernel(a, b, divisor=d2))

    mmd = (
        kmean(true_samples, true_samples)
        + kmean(zm, zm)
        - 2.0 * kmean(true_samples, zm)
    )
    return mmd + jnp.mean(jnp.square(x_hat - x))


def triplet_margin_loss(
    anchor: jnp.ndarray,
    positive: jnp.ndarray,
    negative: jnp.ndarray,
    margin: float = 1.0,
) -> jnp.ndarray:
    """mean(relu(||a-p|| - ||a-n|| + margin)) with sqrt-L2 distances.

    Implements torch.nn.TripletMarginLoss default semantics (p=2, sqrt'd
    distances, pairwise_distance eps). NOTE: this intentionally differs from
    the reference model's loss — reference triplet_encoder.py:178-194 (and
    our MultiTripletNetwork, models/triplet_encoder.py::_squared_triplet_loss)
    use SQUARED distances with no sqrt. This export exists as the torch-
    compatible utility; the model uses its own squared-distance formulation.
    """
    eps = 1e-6  # torch pairwise_distance epsilon
    d_pos = jnp.sqrt(jnp.sum(jnp.square(anchor - positive), axis=-1) + eps)
    d_neg = jnp.sqrt(jnp.sum(jnp.square(anchor - negative), axis=-1) + eps)
    return jnp.mean(jnp.maximum(d_pos - d_neg + margin, 0.0))
