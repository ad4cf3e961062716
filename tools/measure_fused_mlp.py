"""Does the Pallas fused Linear-BN-ReLU-Dropout kernel earn its keep?
(round-3 verdict item 4: "justify or demote the Pallas kernels with a
measurement")

The kernel (ops/pallas/fused_linear.py) targets the small memory-bound
encoder blocks of the flagship workload — hundreds of vmapped HPO trials
at batch 64 — where the (K, B, H) activation between Linear and the
BN/ReLU/Dropout chain would otherwise round-trip HBM (K=512, B=64,
H=600: 78 MB per materialized tensor). At production-scale single-model
shapes the kernel deliberately falls back to unfused math
(fused_linear.py _exceeds_vmem): those GEMMs are MXU-bound and XLA's
fusion already hides the elementwise chain, so bench_large_model is the
WRONG arena — the decision-relevant measurement is the headline trial
engine itself.

This script times the exact headline configuration (DirectPred, gex 2000
x cnv 1000, batch 64, 10 epochs, K=512) with config fused_kernels
True vs False: one compile warm-up plus best-of-2 timed runs per arm
(matching bench.py's best-of-N policy for the shared tunnel's 2-4x
contention swings). Each arm pays its own ~110s tunnel compile.

Run on the real TPU: python tools/measure_fused_mlp.py
Result recorded in docs/performance.md ("What did NOT work" or the
trial-engine lever table, whichever way it lands).

RESULTS (real TPU, 2026-08-19):
- First run: the fused arm FAILED TO LOWER under vmap ("Block spec for
  args[5]": the scalar SMEM seed operand has no legal block shape under
  the pallas batching rule). Fixed by moving dropout out of the kernel
  (FusedMLP now applies nn.Dropout on the kernel output, same stream as
  the unfused MLP).
- Second run (post-fix): fused arm lowers and runs, and XLA wins —
  unfused 13.77 s vs fused 19.7 s at K=512 (fused_over_xla 0.699).
  Under vmap the kernel becomes one grid program per (trial, tile) and
  forfeits XLA's cross-trial GEMM batching. `fused_kernels` is therefore
  documented experimental; the unfused default is the defended config.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, GEX, CNV, LATENT, SUP_HIDDEN, BATCH, EPOCHS, N_CLASSES = (
    2000, 2000, 1000, 64, 16, 64, 10, 4
)


def build_engine(fused: bool):
    from flexynesis_tpu.data.dataset import MultiOmicDataset
    from flexynesis_tpu.models.direct_pred import DirectPred
    from flexynesis_tpu.parallel.trials import ParallelTrials

    rng = np.random.default_rng(0)
    cls = rng.integers(0, N_CLASSES, N)
    gex = (rng.normal(size=(N, GEX)) + 0.5 * cls[:, None]).astype(np.float32)
    cnv = (rng.normal(size=(N, CNV)) + 0.3 * cls[:, None]).astype(np.float32)
    ds = MultiOmicDataset(
        dat={"gex": gex, "cnv": cnv},
        ann={"subtype": cls.astype(np.float32)},
        variable_types={"subtype": "categorical"},
        features={"gex": [f"g{i}" for i in range(GEX)],
                  "cnv": [f"c{i}" for i in range(CNV)]},
        samples=[f"S{i}" for i in range(N)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(N_CLASSES)}},
    )
    cfg = {"latent_dim": LATENT, "hidden_dim_factor": 0.3, "lr": 1e-3,
           "supervisor_hidden_dim": SUP_HIDDEN, "epochs": EPOCHS,
           "batch_size": BATCH, "fused_kernels": fused}
    model = DirectPred(cfg, ds, target_variables=["subtype"])
    tr = np.arange(int(N * 0.8))
    va = np.arange(int(N * 0.8), N)
    return ParallelTrials(model, ds), tr, va


def measure_arm(fused: bool, k: int):
    import jax

    pt, tr, va = build_engine(fused)
    lrs, seeds = np.full(k, 1e-3), np.arange(k)

    def run():
        t0 = time.perf_counter()
        out = pt.run(lrs=lrs, seeds=seeds, train_idx=tr, val_idx=va,
                     batch_size=BATCH, max_epochs=EPOCHS,
                     epochs_per_eval=EPOCHS)
        assert np.all(np.isfinite(out["best_val_loss"]))
        return time.perf_counter() - t0

    compile_s = run()  # compile warm-up, excluded
    wall = min(run() for _ in range(2))
    del pt
    jax.clear_caches()
    return {
        "fused_kernels": fused,
        "k_trials": k,
        "wall_s": round(wall, 2),
        "trials_per_hour": round(k * 3600.0 / wall, 1),
        "compile_s": round(compile_s, 1),
    }


def main():
    k = int(os.environ.get("FUSED_K", "512"))
    arms = []
    for fused in (False, True):
        try:
            r = measure_arm(fused, k)
        except Exception as e:  # a vmapped-Mosaic lowering failure IS a result
            r = {"fused_kernels": fused, "k_trials": k,
                 "error": f"{type(e).__name__}: {e}"[:300]}
        arms.append(r)
        print(json.dumps(r), file=sys.stderr, flush=True)
    out = {"fused_mlp_engine": arms}
    if all("wall_s" in a for a in arms):
        out["fused_over_xla"] = round(arms[0]["wall_s"] / arms[1]["wall_s"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
