"""Is the trial engine's dispatch->fetch gap REAL under current tunnel
conditions?

The pipelined GP ask (train/gp.py AskSession) hides host work in the gap
between a chunk's async dispatch and its blocking fetch. If the tunnel's
dispatch is effectively synchronous (backpressure under contention), the
"gap" opens only AFTER device work finished, and host work extends the
round instead of hiding — pipeline_speedup drops below 1.0 (observed
0.80-0.81 on 2026-08-18 vs 1.16-1.62 the day before, same code).

This tool times, for a headline-shape K=512 chunk:
  dispatch_s   — wall of the _train_chunk call itself (async if small)
  sleep-probe  — host sleep of X s inserted in the gap, then fetch:
                 if round wall grows by ~X, the gap does NOT overlap
                 device work; if wall is ~unchanged until X ~= device
                 time, the gap is real.

Run: python tools/measure_dispatch_gap.py  (real TPU, ~3-4 min incl. one
~110s tunnel compile).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench

    # reuse the bench's own headline-engine recipe (and its compile
    # warm-up) so this tool diagnoses EXACTLY the engine the e2e section
    # runs, not a hand-rolled near-copy that could drift
    gex, cnv, cls = bench._synth()
    K = 512
    bench.bench_tpu(gex, cnv, cls, k=K)
    pt, tr, va = bench._HEADLINE_CACHE[K]
    lrs = np.full(K, 1e-3, np.float32)

    def run(host_work=None):
        t0 = time.perf_counter()
        pt.run(lrs=lrs, seeds=np.arange(K), train_idx=tr, val_idx=va,
               batch_size=bench.BATCH, max_epochs=bench.EPOCHS,
               epochs_per_eval=bench.EPOCHS, host_work=host_work)
        return time.perf_counter() - t0

    base = min(run() for _ in range(2))
    print(f"baseline round (no host work): {base:.2f}s", flush=True)

    for frac in (0.5, 1.0, 1.5):
        target = base * frac
        slept = []

        def sleeper(budget, target=target, slept=slept):
            t0 = time.perf_counter()
            time.sleep(target)
            slept.append(time.perf_counter() - t0)

        wall = run(host_work=sleeper)
        overlap = base + sum(slept) - wall
        print(
            f"gap sleep {target:.2f}s -> round {wall:.2f}s "
            f"(overlapped ~{max(overlap, 0.0):.2f}s of {sum(slept):.2f}s "
            f"host work)",
            flush=True,
        )


if __name__ == "__main__":
    main()
