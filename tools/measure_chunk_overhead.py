"""Measure the per-chunk dispatch+fetch overhead of ParallelTrials.run
through the remote-compile tunnel.

Question: can bench_large_model's paired-diff design use ONE compiled
chunk shape (run(3E, epochs_per_eval=E) = 3 dispatches of the E-epoch
chunk) instead of two (E-epoch and 3E-epoch programs)? The single-shape
design saves a 60-110s tunnel compile per bench run, but its diff carries
2 extra per-chunk dispatch+fetch overheads. This tool quantifies them:

    same 30 total epochs, warm:
      A = min wall of run(30, epochs_per_eval=10)   # 3 chunks, 3 fetches
      B = min wall of run(30, epochs_per_eval=30)   # 1 chunk, 1 fetch
      per-chunk overhead = (A - B) / 2

Run: python tools/measure_chunk_overhead.py   (real TPU, ~5 min: pays one
compile per chunk shape).

MEASURED (v5e through the tunnel, 2026-08-18):
  per-chunk dispatch+fetch overhead: 54.2 ms -> single-shape paired diff
  would carry ~12.7% error on the ~0.85s device portion. KEEP the
  two-shape design in bench_large_model.
  Decisive surprise: the SECOND chunk shape (30-epoch program, right
  after the 10-epoch one) compiled in 2.6s, not 60-110s — the tunnel-side
  XLA session caches subcomputations within a process, so same-structure
  programs after the first are cheap. bench_large_model's ~90-180s cost
  is the one-time 256MB host->device transfer + FIRST compile, not the
  second shape.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench
    from flexynesis_tpu.data.dataset import MultiOmicDataset
    from flexynesis_tpu.models.direct_pred import DirectPred
    from flexynesis_tpu.parallel.trials import ParallelTrials

    n, g, latent, batch, epochs = 4096, 16384, 256, 1024, 10
    rng = np.random.default_rng(5)
    cls = rng.integers(0, bench.N_CLASSES, n)
    X = (rng.normal(size=(n, g)).astype(np.float32)
         + 0.3 * cls[:, None].astype(np.float32))
    ds = MultiOmicDataset(
        dat={"gex": X},
        ann={"subtype": cls.astype(np.float32)},
        variable_types={"subtype": "categorical"},
        features={"gex": [f"g{i}" for i in range(g)]},
        samples=[f"S{i}" for i in range(n)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(bench.N_CLASSES)}},
    )
    cfg = {"latent_dim": latent, "hidden_dim_factor": bench.HIDDEN_FACTOR,
           "lr": 1e-3, "supervisor_hidden_dim": bench.SUP_HIDDEN,
           "epochs": epochs, "batch_size": batch}
    model = DirectPred(cfg, ds, target_variables=["subtype"])
    tr, va = np.arange(n - batch), np.arange(n - batch, n)
    pt = ParallelTrials(model, ds)
    lrs, seeds = np.full(1, 1e-3), np.arange(1)

    def run(total, per_eval):
        t0 = time.perf_counter()
        out = pt.run(lrs=lrs, seeds=seeds, train_idx=tr, val_idx=va,
                     batch_size=batch, max_epochs=total,
                     epochs_per_eval=per_eval)
        assert np.all(np.isfinite(out["best_val_loss"]))
        return time.perf_counter() - t0

    t = time.perf_counter()
    run(30, 10)  # compiles the 10-epoch chunk
    print(f"compile+first 3x10: {time.perf_counter() - t:.1f}s", flush=True)
    a = [run(30, 10) for _ in range(4)]
    print("A (3 chunks of 10):", [round(x, 3) for x in a], flush=True)
    t = time.perf_counter()
    run(30, 30)  # compiles the 30-epoch chunk
    print(f"compile+first 1x30: {time.perf_counter() - t:.1f}s", flush=True)
    b = [run(30, 30) for _ in range(4)]
    print("B (1 chunk of 30):", [round(x, 3) for x in b], flush=True)
    per_chunk = (min(a) - min(b)) / 2
    print(f"per-chunk dispatch+fetch overhead: {per_chunk * 1000:.1f} ms")
    # context: the bench diff's device portion is ~20 epochs
    dev_20ep = 2 * min(b) / 3  # rough: 20 epochs at the 30-epoch rate
    print(f"diff device portion ~{dev_20ep:.3f}s -> single-shape error "
          f"~{100 * 2 * per_chunk / max(dev_20ep, 1e-9):.1f}%")


if __name__ == "__main__":
    main()
