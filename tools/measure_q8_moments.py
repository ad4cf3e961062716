"""Measure block-scaled int8 Adam moments vs bfloat16 on the headline engine.

The K-trial HPO engine is HBM-bound; per element per step the SR-bf16 path
moves 2(p)+2(m)+2(v)+2(g) read + 6 written bytes. q8 moments
(ops/sr_adam.py q8_encode_*) store m as int8-linear-SR and v as log8 with
per-row f32 scales: 2+1+1+2 read + 4 written (+~8/row for scales), a ~1.4x
traffic cut if convergence holds and the quant math fuses into the update
chain.

Run ON THE REAL TPU (no env vars): prints one JSON dict with trials/hour
per arm, the speedup, per-trial val-loss deltas, and the lr-ranking
agreement between arms (what HPO actually consumes).

Usage: python tools/measure_q8_moments.py   [Q8_K=512] [Q8_EPOCHS=10]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# identical to bench.py's headline workload (BRCA-like scale)
N_SAMPLES, GEX, CNV, N_CLASSES = 2000, 2000, 1000, 4
LATENT, HIDDEN_FACTOR, SUP_HIDDEN, BATCH = 64, 0.3, 16, 64
K = int(os.environ.get("Q8_K", 512))
EPOCHS = int(os.environ.get("Q8_EPOCHS", 10))


def main():
    from flexynesis_tpu.data.dataset import MultiOmicDataset
    from flexynesis_tpu.models.direct_pred import DirectPred
    from flexynesis_tpu.parallel.trials import ParallelTrials

    rng = np.random.default_rng(0)
    cls = rng.integers(0, N_CLASSES, N_SAMPLES)
    gex = (rng.normal(size=(N_SAMPLES, GEX)) + 0.5 * cls[:, None]).astype(
        np.float32
    )
    cnv = (rng.normal(size=(N_SAMPLES, CNV)) + 0.3 * cls[:, None]).astype(
        np.float32
    )
    ds = MultiOmicDataset(
        dat={"gex": gex, "cnv": cnv},
        ann={"subtype": cls.astype(np.float32)},
        variable_types={"subtype": "categorical"},
        features={
            "gex": [f"g{i}" for i in range(GEX)],
            "cnv": [f"c{i}" for i in range(CNV)],
        },
        samples=[f"S{i}" for i in range(N_SAMPLES)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(N_CLASSES)}},
    )
    cfg = {
        "latent_dim": LATENT,
        "hidden_dim_factor": HIDDEN_FACTOR,
        "lr": 1e-3,
        "supervisor_hidden_dim": SUP_HIDDEN,
        "epochs": EPOCHS,
        "batch_size": BATCH,
    }
    tr = np.arange(int(N_SAMPLES * 0.8))
    va = np.arange(int(N_SAMPLES * 0.8), N_SAMPLES)
    # log-spaced lrs so the two arms' PER-TRIAL RANKINGS are a meaningful
    # fidelity check (HPO consumes rankings, not absolute losses)
    lrs = np.logspace(-4, -2, K).astype(np.float32)
    seeds = np.arange(K)

    arms = os.environ.get("Q8_ARMS", "bfloat16,int8").split(",")
    out = {"k": K, "epochs": EPOCHS}
    losses = {}
    for moments in arms:
        model = DirectPred(cfg, ds, target_variables=["subtype"])
        pt = ParallelTrials(model, ds, moment_dtype=moments)
        run = lambda e: pt.run(
            lrs=lrs, seeds=seeds, train_idx=tr, val_idx=va,
            batch_size=BATCH, max_epochs=e, epochs_per_eval=e,
        )
        run(EPOCHS)  # compile + warm (through the remote-compile tunnel)
        t0 = time.perf_counter()
        r = run(EPOCHS)
        wall = time.perf_counter() - t0
        losses[moments] = np.asarray(r["best_val_loss"])
        out[moments] = {
            "wall_s": round(wall, 3),
            "trials_per_hour": round(K * 3600.0 / wall, 1),
            "best_val_loss_median": float(np.median(losses[moments])),
            "best_val_loss_min": float(np.min(losses[moments])),
        }
        # stream each arm as it lands so a later crash/kill (or a
        # single-arm Q8_ARMS run) never discards a multi-minute measurement
        print(json.dumps({moments: out[moments]}), flush=True)
        # both K=512 arms cannot be HBM-resident at once (the first arm's
        # engine + stacked state would OOM the second's compile)
        import gc

        del model, pt, r, run
        gc.collect()

    if len(arms) >= 2:  # cross-arm fidelity only when two arms were run
        a, b = losses[arms[0]], losses[arms[1]]
        ra, rb = np.argsort(np.argsort(a)), np.argsort(np.argsort(b))
        spearman = float(np.corrcoef(ra, rb)[0, 1])
        out[f"speedup_{arms[1]}_vs_{arms[0]}"] = round(
            out[arms[1]]["trials_per_hour"] / out[arms[0]]["trials_per_hour"],
            3,
        )
        out["val_loss_median_delta"] = float(np.median(b) - np.median(a))
        out["lr_ranking_spearman"] = round(spearman, 4)
        out["top16_overlap"] = int(
            len(set(np.argsort(a)[:16]) & set(np.argsort(b)[:16]))
        )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
