"""Marker discovery: IntegratedGradients / GradientShap as jax.grad programs.

Capability parity with the reference's Captum usage (per-model
``compute_feature_importance``, e.g. direct_pred.py:432-590): zero baselines,
per-class attributions, |attr| summed over samples / divided by n, assembled
into a tidy DataFrame (target_variable / target_class / target_class_label /
layer / name / importance).

TPU-first design: Captum's python loop over IG steps becomes a single
``vmap`` over interpolation points whose gradients are computed in one
batched VJP; classes are likewise vmapped. IG uses Gauss-Legendre quadrature
nodes/weights, matching Captum's default ``method="gausslegendre"``.
GradientShap draws uniform path scales with N(0, stdev) input noise
(stdevs=0 with zero baselines in the reference CLI) via jax.random.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd


def _gauss_legendre(n_steps: int):
    """Nodes/weights on [0, 1] (Captum's default IG quadrature)."""
    nodes, weights = np.polynomial.legendre.leggauss(n_steps)
    return (nodes + 1.0) * 0.5, weights * 0.5


def integrated_gradients(
    forward,  # params-free fn: {layer: (B, F)} -> (B, n_out)
    x: Dict[str, jnp.ndarray],
    target_class: int,
    n_steps: int,
    single_output: bool,
):
    """IG attributions w.r.t. every input layer, zero baseline.

    attr = x * sum_k w_k * d f(a_k * x) / dx  evaluated at Gauss-Legendre
    nodes a_k — one vmapped gradient over all steps.
    """
    alphas, weights = _gauss_legendre(n_steps)
    alphas = jnp.asarray(alphas, jnp.float32)
    weights = jnp.asarray(weights, jnp.float32)

    def scalar_out(xs):
        out = forward(xs)
        if single_output:
            return jnp.sum(out)
        return jnp.sum(out[:, target_class])

    def grad_at(alpha):
        return jax.grad(scalar_out)(jax.tree.map(lambda a: a * alpha, x))

    grads = jax.vmap(grad_at)(alphas)  # {layer: (steps, B, F)}
    avg = jax.tree.map(
        lambda g: jnp.tensordot(weights, g, axes=1), grads
    )  # {layer: (B, F)}
    return jax.tree.map(lambda a, g: a * g, x, avg)


def gradient_shap(
    forward,
    x: Dict[str, jnp.ndarray],
    target_class: int,
    n_samples: int,
    single_output: bool,
    rng: jax.Array,
    stdevs: float = 0.0,
):
    """GradientShap with zero baselines: attr = E_u[ grad f(u*(x+noise)) ] * x.

    Captum semantics (InputBaselineXGradient): ONE uniform path coefficient
    is drawn per (sample, draw) and SHARED across every input layer, so the
    gradient is evaluated on the straight path between the joint baseline
    and the joint input — independent per-layer scales would sample
    off-path points and change the estimator for models with
    cross-modality interactions. Noise (stdevs>0) perturbs the input
    BEFORE scaling, like Captum's u*(x + noise - baseline).
    """

    def scalar_out(xs):
        out = forward(xs)
        if single_output:
            return jnp.sum(out)
        return jnp.sum(out[:, target_class])

    first = next(iter(x.values()))
    n_batch = first.shape[0]

    def sample_attr(key):
        ku, kn = jax.random.split(key)
        # one uniform scale per (sample, draw), shared across layers
        u = jax.random.uniform(ku, (n_batch,) + (1,) * (first.ndim - 1))
        pt = {}
        for i, k in enumerate(x):
            xi = x[k]
            if stdevs > 0:
                xi = xi + stdevs * jax.random.normal(
                    jax.random.fold_in(kn, i), xi.shape
                )
            pt[k] = xi * u
        g = jax.grad(scalar_out)(pt)
        return jax.tree.map(lambda a, gg: a * gg, x, g)

    keys = jax.random.split(rng, n_samples)
    attrs = jax.vmap(sample_attr)(keys)
    return jax.tree.map(lambda a: jnp.mean(a, axis=0), attrs)


def _all_class_abs_attr_program(model):
    """Per-model cached jit of the all-class |attr| program.

    ``params``/``batch_stats``/``x``/``extra`` are jit ARGUMENTS, not
    closure constants: closed-over arrays inline into the HLO (the
    remote-compile tunnel rejects large ones with HTTP 413) — ``extra``
    carries ``model._eval_extra_args()`` operands (GNN adjacency) for the
    same reason. The program is cached ON the model instance rather than
    in a module-level jit keyed by the bound method: a global cache with
    the method as a static arg would strongly retain every model ever
    attributed (params, module, extras) for the process lifetime.
    """
    fn = getattr(model, "_attr_jit_fn", None)
    if fn is not None:
        return fn

    @partial(
        jax.jit,
        static_argnames=("target_var", "n_steps", "n_class", "method"),
    )
    def fn(params, batch_stats, x, extra, target_var: str, n_steps: int,
           n_class: int, method: str, rng):
        single = n_class == 1

        def forward(xs):
            return model._attribution_forward(
                params, batch_stats, xs, target_var, *extra
            )

        def per_class(c):
            if method == "IntegratedGradients":
                attr = integrated_gradients(forward, x, c, n_steps, single)
            else:
                attr = gradient_shap(forward, x, c, n_steps, single, rng)
            return jax.tree.map(lambda a: jnp.sum(jnp.abs(a), axis=0), attr)

        # class axis is tiny and head weights differ per class -> unrolled
        # python loop at trace time (still one jit program; XLA
        # parallelizes freely)
        return [per_class(c) for c in range(n_class)]

    model._attr_jit_fn = fn
    return fn


def abs_attribution_sums(
    model,
    dataset,
    target_var: str,
    method: str = "IntegratedGradients",
    steps_or_samples: int = 5,
    batch_size: int = 512,
    rng_seed: int = 42,
    mesh=None,
):
    """Per-class, per-layer sum of |attributions| over all samples.

    Returns (sums, n_class, n) where sums[c][layer] is a (n_features,) array.

    ``mesh`` shards the SAMPLE axis of each batch across the mesh's first
    axis (SURVEY.md §5.7's "sequence parallel" analog): attributions are
    per-sample independent, params/stats replicate, and the per-batch
    |attr| reduction becomes an XLA psum — so cohorts far beyond the
    reference's 10k-sample cap (__main__.py:1377-1387) attribute at full
    size, matching the single-device result exactly.
    """
    if method not in ("IntegratedGradients", "GradientShap"):
        raise ValueError(
            f"Unsupported method '{method}'. Choose 'IntegratedGradients' or 'GradientShap'."
        )
    params, batch_stats = model.params, model.batch_stats
    extra = tuple(model._eval_extra_args())
    layers: List[str] = model.layers

    data_sharding = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        n_dev = int(np.prod(mesh.devices.shape))
        axis = mesh.axis_names[0]
        # every compiled batch must split evenly over the mesh axis
        batch_size = int(np.ceil(batch_size / n_dev) * n_dev)
        data_sharding = NamedSharding(mesh, P(axis))
        replicated = NamedSharding(mesh, P())
        params = jax.device_put(params, replicated)
        batch_stats = jax.device_put(batch_stats, replicated)
        extra = jax.device_put(extra, replicated)

    if dataset.variable_types[target_var] == "numerical":
        n_class = 1
    else:
        from ..models.base import num_classes_for

        n_class = num_classes_for(dataset.ann[target_var])

    n = len(dataset)
    sums = None
    rng = jax.random.key(rng_seed)
    for start in range(0, n, batch_size):
        idx = np.arange(start, min(start + batch_size, n))
        x = {k: jnp.asarray(dataset.dat[k][idx]) for k in layers}
        if len(idx) < batch_size and (n > batch_size or mesh is not None):
            # zero-pad the ragged tail so one compiled shape serves all
            # batches (and shards evenly); zero inputs have exactly zero
            # attribution here (x * grad with x = 0), so sums are unaffected
            pad = batch_size - len(idx)
            x = {k: jnp.pad(v, ((0, pad), (0, 0))) for k, v in x.items()}
        if data_sharding is not None:
            x = jax.device_put(x, data_sharding)
        rng, sub = jax.random.split(rng)
        per_class = _all_class_abs_attr_program(model)(
            params, batch_stats, x, extra, target_var,
            int(steps_or_samples), int(n_class), method, sub,
        )
        if sums is None:
            sums = per_class
        else:
            sums = [
                jax.tree.map(lambda a, b: a + b, s, p)
                for s, p in zip(sums, per_class)
            ]
    return sums, n_class, n


def compute_feature_importance(
    model,
    dataset,
    target_var: str,
    method: str = "IntegratedGradients",
    steps_or_samples: int = 5,
    batch_size: int = 512,
    rng_seed: int = 42,
    mesh=None,
) -> pd.DataFrame:
    """Tidy per-feature importance table for one target variable."""
    sums, n_class, n = abs_attribution_sums(
        model, dataset, target_var,
        method=method, steps_or_samples=steps_or_samples,
        batch_size=batch_size, rng_seed=rng_seed, mesh=mesh,
    )
    layers: List[str] = model.layers
    rows = []
    for c in range(n_class):
        label = (
            dataset.label_mappings[target_var].get(c)
            if target_var in dataset.label_mappings
            else ""
        )
        for layer in layers:
            imp = np.asarray(sums[c][layer]) / n
            rows.append(
                pd.DataFrame(
                    {
                        "target_variable": target_var,
                        "target_class": c,
                        "target_class_label": label,
                        "layer": layer,
                        "name": list(dataset.features[layer]),
                        "importance": imp,
                    }
                )
            )
    return pd.concat(rows, ignore_index=True)
