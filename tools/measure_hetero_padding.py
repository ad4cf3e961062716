"""Measure padded-to-max vs shape-bucketed throughput for hetero HPO rounds.

VERDICT r2 #5 / SURVEY §7.3: heterogeneous trials (different latent/hidden
dims) either (a) pad every trial to the round's max dims and run ONE vmapped
program with per-trial element masks (parallel/hetero.py — the default), or
(b) bucket by exact shape and run one vmapped program per bucket. Padding
wastes FLOPs/HBM on the small trials; bucketing pays one XLA program +
dispatch per distinct shape. This script times both on a realistic GP round
(latent_dim uniform over the quantized grid 16..128, hidden_dim_factor
0.2..0.5) and prints the ratio, so the default is measured, not assumed.

    python tools/measure_hetero_padding.py          # on the TPU tunnel
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from flexynesis_tpu.data.dataset import MultiOmicDataset  # noqa: E402
from flexynesis_tpu.models.direct_pred import DirectPred  # noqa: E402

N, GEX, CNV = 1000, 1000, 500
K = 64
EPOCHS = 10
BATCH = 64
N_CLASSES = 4


def make_ds(seed=0):
    rng = np.random.default_rng(seed)
    cls = rng.integers(0, N_CLASSES, N)
    return MultiOmicDataset(
        dat={
            "gex": (rng.normal(size=(N, GEX)) + 0.5 * cls[:, None]).astype(
                np.float32
            ),
            "cnv": (rng.normal(size=(N, CNV)) + 0.3 * cls[:, None]).astype(
                np.float32
            ),
        },
        ann={"subtype": cls.astype(np.float32)},
        variable_types={"subtype": "categorical"},
        features={"gex": [f"g{i}" for i in range(GEX)],
                  "cnv": [f"c{i}" for i in range(CNV)]},
        samples=[f"S{i}" for i in range(N)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(N_CLASSES)}},
    )


def gp_like_round(seed=3):
    """K suggestions as a GP round would produce them: quantized dims.

    Dims are drawn from the quantized grid that config.py uses exactly so
    trial shapes can bucket (4 latents; factor/sup fixed — a favourable
    case FOR bucketing, since fewer buckets means fewer compiles; if
    padding wins here it wins a fortiori on wider rounds, where bucketing
    pays a ~60-110s tunnel compile per extra distinct shape).
    """
    rng = np.random.default_rng(seed)
    sugg = []
    for _ in range(K):
        sugg.append({
            "latent_dim": int(rng.choice([16, 48, 96, 128])),
            "hidden_dim_factor": 0.3,
            "lr": float(10 ** rng.uniform(-4, -2)),
            "supervisor_hidden_dim": 16,
            "epochs": EPOCHS,
            "batch_size": BATCH,
        })
    return sugg


def run_padded(ds, group, tr, va):
    from flexynesis_tpu.parallel.hetero import build_padded_trials, max_config
    from flexynesis_tpu.parallel.trials import vmapped_grid_fit

    cfg = dict(group[0])
    cfg.update(max_config(group, [GEX, CNV]))
    template = DirectPred(cfg, ds, target_variables=["subtype"])
    seeds = np.arange(len(group))
    trials = build_padded_trials(template, group, seeds)
    t0 = time.perf_counter()
    out = vmapped_grid_fit(
        template, ds,
        start_params=trials["params"], start_stats=trials["batch_stats"],
        lrs=np.asarray([p["lr"] for p in group], np.float32), seeds=seeds,
        train_idx=np.tile(tr, (len(group), 1)),
        val_idx=np.tile(va, (len(group), 1)),
        masks=trials["masks"], aux=trials.get("aux"),
        batch_size=BATCH, max_epochs=EPOCHS, early_stop_patience=-1,
        param_dtype="bfloat16_sr",
    )
    assert np.all(np.isfinite(out["best_val_loss"]))
    return time.perf_counter() - t0


def run_bucketed(ds, group, tr, va):
    """One vmapped program per exact architecture (lr free)."""
    from flexynesis_tpu.parallel.trials import ParallelTrials

    buckets = {}
    for p in group:
        key = (p["latent_dim"], p["hidden_dim_factor"],
               p["supervisor_hidden_dim"])
        buckets.setdefault(key, []).append(p)
    t0 = time.perf_counter()
    for key, bucket in buckets.items():
        template = DirectPred(dict(bucket[0]), ds,
                              target_variables=["subtype"])
        pt = ParallelTrials(template, ds)
        out = pt.run(
            lrs=np.asarray([p["lr"] for p in bucket], np.float32),
            seeds=np.arange(len(bucket)),
            train_idx=tr, val_idx=va, batch_size=BATCH,
            max_epochs=EPOCHS, early_stop_patience=-1,
        )
        assert np.all(np.isfinite(out["best_val_loss"]))
    return time.perf_counter() - t0, len(buckets)


def main():
    ds = make_ds()
    group = gp_like_round()
    tr = np.arange(int(N * 0.8))
    va = np.arange(int(N * 0.8), N)

    # warm-up (compiles), then best-of-2 timed runs each
    run_padded(ds, group, tr, va)
    padded = min(run_padded(ds, group, tr, va) for _ in range(2))
    _, n_buckets = run_bucketed(ds, group, tr, va)
    bucketed = min(run_bucketed(ds, group, tr, va)[0] for _ in range(2))

    print(f"K={K} trials, latent 16..128, {n_buckets} distinct architectures")
    print(f"padded-to-max (one program): {padded:.2f}s "
          f"({K * 3600 / padded:.0f} trials/h)")
    print(f"bucketed ({n_buckets} programs):  {bucketed:.2f}s "
          f"({K * 3600 / bucketed:.0f} trials/h)")
    print(f"padding overhead ratio: {padded / bucketed:.2f}x "
          f"(<1 means padding is FASTER than bucketing)")


if __name__ == "__main__":
    main()
