"""Parallel HPO-trial execution: vmap over trials, sharded across a mesh.

The reference runs HPO trials strictly sequentially (main.py:352-398). This
module trains K same-architecture trials SIMULTANEOUSLY:

* per-trial parameters are initialized from different seeds and stacked,
* learning rates differ per trial (Adam is applied as scale_by_adam followed
  by a per-trial -lr scaling, which vmaps cleanly),
* each trial consumes its own shuffled batch stream from the shared
  device-resident dataset (vmap broadcasts the data, gathers differ),
* the stacked trial axis is sharded over the ``trial`` axis of a Mesh, so a
  v5e-8 slice trains 8+ trials concurrently; on one chip, vmap still wins by
  batching K tiny GEMMs into one MXU-efficient batched GEMM.

This is the ≥20x HPO wall-clock lever called out in BASELINE.md.
"""

from __future__ import annotations

import os
import time
import weakref
from functools import partial
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..ops.optim import trial_optimizer
from ..ops.sr_adam import trial_update_step


def _init_stacked(model, seeds):
    """Stack fresh per-seed parameter pytrees along a leading trial axis.

    Initialization is vmapped over seeds — K sequential host-side inits would
    otherwise dominate short trials (measured ~8x the actual training time
    for 16 trials x 10 epochs).
    """
    seeds = jnp.asarray(np.asarray(seeds), jnp.uint32)
    try:
        x = {
            k: jnp.zeros((2, d), jnp.float32)
            for k, d in zip(model.layers, model.input_dims)
        }
        # extras (the GNN adjacency) are jit ARGUMENTS, not closure
        # constants: a closed-over dense gene-network adjacency inlines
        # into the HLO, which the remote-compile tunnel rejects (HTTP 413)
        extra = ()
        if hasattr(model, "_adj"):  # GNN signature: module.init(key, x, adj)
            # dense operator (one array) or sparse edge dict (a pytree)
            extra = (jax.tree.map(jnp.asarray, model._adj),)

        def init_all(seeds, x, *extra):
            def init_one(seed):
                return model.module.init(
                    jax.random.key(seed), x, *extra, train=False
                )

            return jax.vmap(init_one)(seeds)

        variables = jax.jit(init_all)(seeds, x, *extra)
        return variables["params"], variables.get("batch_stats", {})
    except Exception:
        # fallback: per-seed host loop through the model's own init_params
        saved = (model.params, model.batch_stats)
        params_list, stats_list = [], []
        for s in np.asarray(seeds):
            p, bs = model.init_params(None, int(s))
            params_list.append(p)
            stats_list.append(bs)
        model.params, model.batch_stats = saved
        params = jax.tree.map(lambda *xs: jnp.stack(xs), *params_list)
        stats = jax.tree.map(lambda *xs: jnp.stack(xs), *stats_list)
        return params, stats


# jitted per-epoch engines keyed on (model object [weak], trace-relevant
# config) — see _get_grid_engine
_GRID_ENGINE_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _get_grid_engine(
    model, moment_dtype: str, param_dtype: str, batch_size: int, n_tr: int,
    n_batches: int,
):
    """Build (or reuse) the jitted per-epoch engine behind vmapped_grid_fit.

    Re-creating the jitted callable per call would re-trace — and through
    the remote-compile tunnel re-COMPILE (~110s per shape, the persistent
    cache does not apply there) — on every GP round even when quantized
    dims produce identical shapes. The cache keys on the model OBJECT
    (weakly held) plus every value baked into the trace; callers that
    reuse a template model across rounds (train/hpo.py caches templates
    per architecture bucket) then hit the same executable. Trial count and
    array shapes are NOT part of the key — the returned jit function
    retraces itself on genuinely new shapes as usual.
    """
    key = (moment_dtype, param_dtype, batch_size, n_tr, n_batches)
    per_model = _GRID_ENGINE_CACHE.get(model)
    if per_model is None:
        per_model = {}
        _GRID_ENGINE_CACHE[model] = per_model
    cached = per_model.get(key)
    if cached is not None:
        return cached

    loss_fn = model.loss_fn
    tx = trial_optimizer(moment_dtype)
    sr = param_dtype == "bfloat16_sr"
    cast32 = (
        (lambda p: jax.tree.map(lambda a: a.astype(jnp.float32), p))
        if sr else (lambda p: p)
    )

    def one_trial_epoch(params, opt_state, stats, rng, lr, mask, tr_i, va_i,
                        aux_i, data):
        samples, shared = data["per_sample"], data["static"]

        def step(carry, batch_idx):
            params, opt_state, stats, rng = carry
            rng, srng = jax.random.split(rng)
            rows = tr_i[batch_idx]
            batch = jax.tree.map(lambda a: a[rows], samples)
            batch.update(shared)
            if aux_i is not None:
                batch["_aux"] = aux_i

            def wrapped(p):
                return loss_fn(cast32(p), stats, batch, srng, True)

            (_, (_, new_stats)), grads = jax.value_and_grad(
                wrapped, has_aux=True
            )(params)
            params, opt_state, rng = trial_update_step(
                params, opt_state, grads, lr, rng, sr=sr, tx=tx, mask=mask
            )
            return (params, opt_state, new_stats, rng), None

        rng, prng = jax.random.split(rng)
        order = jax.random.permutation(prng, n_tr)[
            : n_batches * batch_size
        ].reshape(n_batches, batch_size)
        (params, opt_state, stats, rng), _ = jax.lax.scan(
            step, (params, opt_state, stats, rng), order
        )
        val_batch = jax.tree.map(lambda a: a[va_i], samples)
        val_batch.update(shared)
        if aux_i is not None:
            val_batch["_aux"] = aux_i
        _, (losses, _) = loss_fn(cast32(params), stats, val_batch, None, False)
        return params, opt_state, stats, rng, sum(losses.values())

    # donate the per-epoch carried buffers (params/opt/stats/rngs) — they are
    # reassigned from the outputs every epoch, so XLA can update in place
    # instead of double-buffering the largest arrays. The dataset is a jit
    # ARGUMENT (broadcast across trials, in_axes=None), never a closure
    # constant: closed-over arrays inline into the HLO, which the
    # remote-compile tunnel rejects for real datasets (HTTP 413).
    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def epoch_vmapped(params, opt_state, stats, rngs, lrs, masks, tr, va, aux,
                      data):
        return jax.vmap(
            one_trial_epoch,
            in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None),
        )(params, opt_state, stats, rngs, lrs, masks, tr, va, aux, data)

    per_model[key] = epoch_vmapped
    return epoch_vmapped


def vmapped_grid_fit(
    model,
    dataset,
    *,
    start_params,
    start_stats,
    lrs: np.ndarray,
    seeds: np.ndarray,
    train_idx: np.ndarray,   # (T, n_tr) per-trial train rows
    val_idx: np.ndarray,     # (T, n_val) per-trial val rows
    masks=None,              # optional per-trial 0/1 update-mask pytree
    aux=None,                # optional per-trial pytree injected as batch['_aux']
    batch_size: int = 32,
    max_epochs: int = 50,
    early_stop_patience: int = -1,
    matmul_precision: str = "bfloat16",
    moment_dtype: str = "bfloat16",
    param_dtype: str = "float32",
    mesh=None,
    host_work: Optional[Callable[[float], object]] = None,
):
    """Train T trials with PER-TRIAL data splits concurrently under vmap.

    The general engine behind CV-fold parallelism (HPO ``use_cv`` and the
    fine-tuner's lr x freeze x fold grid — SURVEY.md §2.3 item 3): every
    trial sees its own train/val row indices into the shared device-resident
    dataset, its own lr/seed, and (optionally) its own parameter-update mask.
    ``start_params=None`` initializes fresh per-seed parameters; otherwise
    the given (unstacked) params/stats broadcast to all trials (fine-tuning).
    ``mesh`` shards the T (trial) axis over the mesh's ``trial`` axis —
    T must divide evenly; callers pass mesh=None otherwise.
    ``host_work(budget_s)`` (optional) is called in the gap between each
    epoch's async dispatch and its blocking fetch — pipelined HPO slices
    the next round's GP ask into these gaps (train/gp.py AskSession).
    Returns {best_val_loss (T,), best_epoch (T,), epochs_run}.
    """
    T = len(lrs)
    data = model.make_batch(dataset)
    static = {k: v for k, v in data.items() if k.startswith("_")}
    per_sample = {k: v for k, v in data.items() if not k.startswith("_")}

    tx = trial_optimizer(moment_dtype)
    n_tr = train_idx.shape[1]
    batch_size = min(batch_size, n_tr)
    n_batches = max(n_tr // batch_size, 1)

    if masks is None:
        template = start_params if start_params is not None else model.params
        if template is None:
            template, _ = model.init_params(None, int(seeds[0]))
        masks_tree = jax.tree.map(lambda _: jnp.ones((T,), jnp.float32), template)
    else:
        masks_tree = masks

    sr = param_dtype == "bfloat16_sr"
    epoch_vmapped = _get_grid_engine(
        model, moment_dtype, param_dtype, int(batch_size), int(n_tr),
        int(n_batches),
    )

    if start_params is not None:
        # ALL leaves must carry the leading trial axis — judging from the
        # first leaf alone misfires when an unstacked leaf's dim0 happens
        # to equal T (e.g. a (45,)-bias with a 45-cell fine-tune grid)
        already_stacked = all(
            hasattr(a, "shape") and a.shape[:1] == (T,)
            for a in jax.tree_util.tree_leaves(start_params)
        )
        if already_stacked:
            # defensive copy: the epoch fn donates these buffers, which
            # would otherwise invalidate the caller's arrays
            copy = lambda tree: jax.tree.map(lambda a: jnp.asarray(a).copy(),
                                             tree)
            params, stats = copy(start_params), copy(start_stats)
        else:
            bcast = lambda tree: jax.tree.map(
                lambda a: jnp.broadcast_to(a, (T,) + a.shape).copy(), tree
            )
            params = bcast(start_params)
            stats = bcast(start_stats)
    else:
        params, stats = _init_stacked(model, seeds)
    if sr:
        from ..ops.sr_adam import cast_stacked_params_for_sr, sr_adam_init

        params = cast_stacked_params_for_sr(params, T)
        opt_state = jax.vmap(
            partial(sr_adam_init, moment_dtype=moment_dtype)
        )(params)
    else:
        opt_state = jax.vmap(tx.init)(params)
    rngs = jax.vmap(jax.random.key)(jnp.asarray(np.asarray(seeds), jnp.uint32))
    lrs_dev = jnp.asarray(lrs, jnp.float32)
    tr = jnp.asarray(train_idx)
    va = jnp.asarray(val_idx)

    aux_dev = (
        jax.tree.map(jnp.asarray, aux) if aux is not None else None
    )
    if mesh is not None:
        from .mesh import shard_leading_axis, trial_sharding

        sh = trial_sharding(mesh)
        params = shard_leading_axis(params, sh)
        opt_state = shard_leading_axis(opt_state, sh)
        stats = shard_leading_axis(stats, sh)
        masks_tree = shard_leading_axis(masks_tree, sh)
        tr = jax.device_put(tr, sh)
        va = jax.device_put(va, sh)
        if aux_dev is not None:
            aux_dev = shard_leading_axis(aux_dev, sh)
    best = np.full(T, np.inf)
    best_epoch = np.zeros(T, dtype=int)
    stall = np.zeros(T, dtype=int)
    epochs_run = 0
    data_arg = {
        "per_sample": jax.tree.map(jnp.asarray, per_sample),
        "static": jax.tree.map(jnp.asarray, static),
    }
    epoch_wall_est = None
    for epoch in range(max_epochs):
        t_ep = time.perf_counter()
        with jax.default_matmul_precision(matmul_precision):
            params, opt_state, stats, rngs, vloss = epoch_vmapped(
                params, opt_state, stats, rngs, lrs_dev, masks_tree, tr, va,
                aux_dev, data_arg,
            )
        if host_work is not None:
            # the dispatch above is async; the device crunches this epoch
            # while the host runs a budget-bounded slice of GP-ask work
            # (budget = ~90% of the previous epoch's wall, so the fetch
            # below rarely has to wait on the host)
            spent = time.perf_counter() - t_ep
            budget = (
                max(0.0, 0.9 * epoch_wall_est - spent)
                if epoch_wall_est is not None else 0.05
            )
            host_work(budget)
        epochs_run = epoch + 1
        v = np.asarray(vloss)
        epoch_wall_est = time.perf_counter() - t_ep
        improved = v < best
        best = np.where(improved, v, best)
        best_epoch = np.where(improved, epochs_run, best_epoch)
        stall = np.where(improved, 0, stall + 1)
        if early_stop_patience > 0 and np.all(stall >= early_stop_patience):
            break
    return {
        "best_val_loss": best,
        "best_epoch": np.maximum(best_epoch, 1),
        "epochs_run": epochs_run,
    }


def equal_kfold_indices(n: int, k: int, seed: int = 42):
    """(k, n_tr) / (k, n_val) equal-size fold index tables (trims n % k)."""
    rng = np.random.default_rng(seed)
    n_cv = (n // k) * k
    perm = rng.permutation(n)[:n_cv]
    folds = perm.reshape(k, n_cv // k)
    train = np.stack(
        [np.concatenate([folds[j] for j in range(k) if j != i]) for i in range(k)]
    )
    return train, folds


class ParallelTrials:
    """Train K same-shape trials of one model template concurrently."""

    def __init__(self, model, dataset, mesh=None, matmul_precision="bfloat16",
                 moment_dtype="bfloat16", param_dtype="bfloat16_sr"):
        # bf16 matmul passes are the TPU analog of the reference's
        # torch.set_float32_matmul_precision("medium") (main.py:24);
        # bf16 Adam moments halve the HBM-bound optimizer traffic
        # (ops/optim.py — float32 math, rounded storage).
        # param_dtype="bfloat16_sr" (default) additionally stores large
        # parameter leaves in bfloat16 with stochastic rounding
        # (ops/sr_adam.py) — unbiased rounding, f32 math; measured 1.3x
        # faster at K=256 with identical convergence, and the freed HBM
        # fits K=512 on one v5e chip. "float32" restores plain optax.
        self.model = model
        self.dataset = dataset
        self.mesh = mesh
        self.matmul_precision = matmul_precision
        self.moment_dtype = moment_dtype
        self.param_dtype = param_dtype
        self._train_chunk = None
        self._tx = None
        # wall time of the last chunk per (K, n_epochs) shape — budgets
        # host_work gaps across run() calls (HPO rounds repeat the shape)
        self._chunk_wall_est: Dict = {}

    def _build(self):
        loss_fn = self.model.loss_fn
        tx = trial_optimizer(self.moment_dtype)
        sr = self.param_dtype == "bfloat16_sr"
        cast32 = (
            (lambda p: jax.tree.map(lambda a: a.astype(jnp.float32), p))
            if sr else (lambda p: p)
        )

        def train_step(carry, batch_idx, data):
            params, opt_state, batch_stats, rng, lr = carry
            rng, step_rng = jax.random.split(rng)
            batch = {
                k: (v if k.startswith("_") else jax.tree.map(lambda a: a[batch_idx], v))
                for k, v in data.items()
            }

            def wrapped(p):
                return loss_fn(cast32(p), batch_stats, batch, step_rng, True)

            (_, (_, new_stats)), grads = jax.value_and_grad(
                wrapped, has_aux=True
            )(params)
            params, opt_state, rng = trial_update_step(
                params, opt_state, grads, lr, rng, sr=sr, tx=tx
            )
            return (params, opt_state, new_stats, rng, lr), None

        def chunk_body(params, opt_state, batch_stats, rng, lr, data, val,
                       n_samples, n_batches, batch_size, n_epochs):
            """n_epochs epochs fully on device: per-epoch permutations come
            from the carried PRNG key (no host round-trips inside a chunk)."""

            def one_epoch(carry, _):
                params, opt_state, batch_stats, rng, lr = carry
                rng, perm_rng = jax.random.split(rng)
                perm = jax.random.permutation(perm_rng, n_samples)[
                    : n_batches * batch_size
                ].reshape(n_batches, batch_size)
                (params, opt_state, batch_stats, rng, lr), _ = jax.lax.scan(
                    lambda c, i: train_step(c, i, data),
                    (params, opt_state, batch_stats, rng, lr),
                    perm,
                )
                _, (losses, _) = loss_fn(
                    cast32(params), batch_stats, val, None, False
                )
                vloss = sum(losses.values())
                return (params, opt_state, batch_stats, rng, lr), vloss

            (params, opt_state, batch_stats, rng, lr), vlosses = jax.lax.scan(
                one_epoch,
                (params, opt_state, batch_stats, rng, lr),
                None,
                length=n_epochs,
            )
            return params, opt_state, batch_stats, rng, vlosses

        @partial(
            jax.jit,
            donate_argnums=(0, 1, 2, 3),
            static_argnames=("n_samples", "n_batches", "batch_size", "n_epochs"),
        )
        def train_chunk_vmapped(
            params, opt_state, batch_stats, rngs, lrs, data, val,
            n_samples, n_batches, batch_size, n_epochs,
        ):
            return jax.vmap(
                lambda p, o, bs, r, lr: chunk_body(
                    p, o, bs, r, lr, data, val,
                    n_samples, n_batches, batch_size, n_epochs,
                ),
            )(params, opt_state, batch_stats, rngs, lrs)

        self._tx = tx
        self._train_chunk = train_chunk_vmapped

    def run(
        self,
        lrs: np.ndarray,
        seeds: np.ndarray,
        *,
        train_idx: np.ndarray,
        val_idx: np.ndarray,
        batch_size: int,
        max_epochs: int,
        early_stop_patience: int = -1,
        epochs_per_eval: int = 5,
        checkpoint_dir: str = None,
        host_work: Optional[Callable[[float], object]] = None,
    ) -> Dict[str, np.ndarray]:
        """Train len(lrs) trials; returns per-trial best val losses + epochs.

        All trials share one train/val split, matching the sequential HPO
        objective (main.py:267-280) which evaluates each trial on the same
        split. ``epochs_per_eval`` epochs run fully on device per host sync;
        early stopping is checked at every epoch boundary from the returned
        per-epoch val losses.

        ``host_work(budget_s)`` (optional) runs in the gap between each
        chunk's async dispatch and its blocking fetch; pipelined HPO
        (train/hpo.py) slices the NEXT round's GP ask into these gaps so
        Bayesian-optimizer host time hides under device time. The budget is
        ~90% of the previous same-shape chunk's wall time (remembered
        across run() calls — consecutive HPO rounds repeat the shape).

        ``checkpoint_dir`` extends the preemption story (SURVEY §5.3/5.4) to
        the trial fan-out: the whole stacked round state saves through orbax
        after every chunk, and a rerun of the same round resumes mid-round
        instead of retraining K trials from scratch.
        """
        if self._train_chunk is None:
            self._build()
        K = len(lrs)
        model, dataset = self.model, self.dataset

        # cache the device-resident batches across runs — repeated runs with
        # the same split (e.g. HPO rounds) skip the host->device transfer
        cache_key = (
            np.asarray(train_idx).tobytes(),
            np.asarray(val_idx).tobytes(),
        )
        if getattr(self, "_data_cache_key", None) != cache_key:
            self._data_cache = (
                model.make_batch(dataset, train_idx),
                model.make_batch(dataset, val_idx),
            )
            self._data_cache_key = cache_key
        train_data, val_data = self._data_cache
        n = len(train_idx)
        batch_size = min(batch_size, n)
        n_batches = max(n // batch_size, 1)

        params, batch_stats = _init_stacked(model, seeds)
        if self.param_dtype == "bfloat16_sr":
            from ..ops.sr_adam import cast_stacked_params_for_sr, sr_adam_init

            K_ax = jax.tree.leaves(params)[0].shape[0]
            params = cast_stacked_params_for_sr(params, K_ax)
            opt_state = jax.vmap(
                partial(sr_adam_init, moment_dtype=self.moment_dtype)
            )(params)
        else:
            opt_state = jax.vmap(self._tx.init)(params)
        rngs = jax.vmap(jax.random.key)(jnp.asarray(seeds, jnp.uint32))
        lrs_dev = jnp.asarray(lrs, jnp.float32)

        if self.mesh is not None:
            from .mesh import shard_leading_axis, trial_sharding

            sh = trial_sharding(self.mesh)
            params = shard_leading_axis(params, sh)
            opt_state = shard_leading_axis(opt_state, sh)
            batch_stats = shard_leading_axis(batch_stats, sh)

        best = np.full(K, np.inf)
        best_epoch = np.zeros(K, dtype=int)
        stall = np.zeros(K, dtype=int)
        epochs_run = 0
        chunk = max(int(epochs_per_eval), 1)

        manager = None
        if checkpoint_dir is not None:
            import hashlib

            import orbax.checkpoint as ocp

            # round identity: resuming a DIFFERENT round (other lrs/seeds/
            # schedule/model) from a same-shaped stale checkpoint would
            # silently return the previous round's results — e.g. GC vs
            # SAGE GNNs share identical param names and shapes, so model
            # class + config + conv type must be part of the identity
            ident = (
                type(self.model).__name__
                + repr(sorted(
                    (k, str(v))
                    for k, v in (getattr(self.model, "config", None) or {}).items()
                ))
                + str(getattr(self.model, "gnn_conv_type", ""))
                # optimizer tree structure: restore rebuilds opt_state by
                # tree_unflattening restored leaves into the FRESH structure,
                # which is only sound if the optimizer chain (and hence leaf
                # order) is identical to the one that wrote the checkpoint
                + str(jax.tree.structure(opt_state))
            )
            fp = hashlib.sha256(
                np.asarray(lrs, np.float64).tobytes()
                + np.asarray(seeds, np.int64).tobytes()
                + np.asarray(
                    [batch_size, max_epochs, chunk, early_stop_patience],
                    np.int64,
                ).tobytes()
                + np.asarray(train_idx).tobytes()
                + np.asarray(val_idx).tobytes()
                + self.moment_dtype.encode()
                + self.param_dtype.encode()
                + ident.encode()
            ).hexdigest()[:16]
            fp_arr = np.frombuffer(bytes.fromhex(fp), dtype=np.uint8).copy()
            manager = ocp.CheckpointManager(
                os.path.abspath(checkpoint_dir),
                options=ocp.CheckpointManagerOptions(max_to_keep=1,
                                                     create=True),
            )
            step = manager.latest_step()
            if step is not None:
                try:
                    state = manager.restore(step)
                    if int(np.asarray(state["meta"]["k"])) != K:
                        raise ValueError("trial count changed")
                    if not np.array_equal(
                        np.asarray(state["meta"]["fingerprint"]), fp_arr
                    ):
                        raise ValueError("different trial round")
                    restored = jax.tree.map(jnp.asarray, state["params"])
                    chex_shapes = jax.tree.map(
                        lambda a, b: a.shape == b.shape, restored, params
                    )
                    if not all(jax.tree.leaves(chex_shapes)):
                        raise ValueError("parameter shapes changed")
                    new_opt = jax.tree_util.tree_unflatten(
                        jax.tree.structure(opt_state),
                        [jnp.asarray(x) for x in
                         jax.tree.leaves(state["opt_state"])],
                    )
                    new_stats = jax.tree.map(jnp.asarray,
                                             state["batch_stats"])
                    new_rngs = jax.random.wrap_key_data(
                        jnp.asarray(state["rngs"]))
                    params, opt_state, batch_stats, rngs = (
                        restored, new_opt, new_stats, new_rngs)
                    if self.mesh is not None:
                        from .mesh import shard_leading_axis, trial_sharding

                        sh = trial_sharding(self.mesh)
                        params = shard_leading_axis(params, sh)
                        opt_state = shard_leading_axis(opt_state, sh)
                        batch_stats = shard_leading_axis(batch_stats, sh)
                    best = np.asarray(state["best"])
                    best_epoch = np.asarray(state["best_epoch"])
                    stall = np.asarray(state["stall"])
                    epochs_run = int(np.asarray(state["meta"]["epochs_run"]))
                    print(f"[INFO] Resumed trial round from epoch "
                          f"{epochs_run} ({checkpoint_dir})")
                except Exception as e:  # stale/mismatched round: start fresh
                    print(f"[WARN] Trial-round checkpoint not resumable "
                          f"({e}); starting fresh")

        def _save_round(epochs_run):
            import orbax.checkpoint as ocp

            # host copies: the device buffers are donated into the next
            # chunk, so they must not be serialized in-flight
            host = jax.tree.map(np.asarray, {
                "params": params,
                "opt_state": opt_state,
                "batch_stats": batch_stats,
                "rngs": jax.random.key_data(rngs),
                "best": best,
                "best_epoch": best_epoch,
                "stall": stall,
            })
            host["meta"] = {"epochs_run": np.asarray(epochs_run),
                            "k": np.asarray(K),
                            "fingerprint": fp_arr}
            manager.save(epochs_run, args=ocp.args.StandardSave(host))
            manager.wait_until_finished()

        while epochs_run < max_epochs:
            n_epochs = min(chunk, max_epochs - epochs_run)
            t_chunk = time.perf_counter()
            with jax.default_matmul_precision(self.matmul_precision):
                params, opt_state, batch_stats, rngs, vlosses = self._train_chunk(
                    params, opt_state, batch_stats, rngs, lrs_dev,
                    train_data, val_data,
                    n_samples=n, n_batches=n_batches, batch_size=batch_size,
                    n_epochs=n_epochs,
                )
            if host_work is not None:
                est = self._chunk_wall_est.get((K, n_epochs))
                spent = time.perf_counter() - t_chunk
                budget = (
                    max(0.0, 0.9 * est - spent) if est is not None else 0.05
                )
                host_work(budget)
            v_chunk = np.asarray(vlosses)  # (K, n_epochs)
            self._chunk_wall_est[(K, n_epochs)] = (
                time.perf_counter() - t_chunk
            )
            stop = False
            for ei in range(n_epochs):
                epochs_run += 1
                v = v_chunk[:, ei]
                improved = v < best
                best = np.where(improved, v, best)
                best_epoch = np.where(improved, epochs_run, best_epoch)
                stall = np.where(improved, 0, stall + 1)
                if early_stop_patience > 0 and np.all(
                    stall >= early_stop_patience
                ):
                    stop = True
                    break
            round_done = stop or epochs_run >= max_epochs
            if manager is not None and not round_done:
                # no save on the final chunk: the checkpoint would be
                # deleted immediately below
                _save_round(epochs_run)
            if stop:
                break
        if manager is not None:
            # the round finished: drop its checkpoint so the next round
            # (possibly same-shaped) starts fresh
            for s in list(manager.all_steps()):
                manager.delete(s)
            manager.close()

        if self.param_dtype == "bfloat16_sr":
            params = jax.tree.map(
                lambda a: a.astype(jnp.float32), params
            )
        return {
            "best_val_loss": best,
            "best_epoch": np.maximum(best_epoch, 1),
            "epochs_run": epochs_run,
            "final_params": params,
            "final_batch_stats": batch_stats,
        }
