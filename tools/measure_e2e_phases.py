"""Run bench_e2e_pipelined standalone with phase instrumentation.

Builds the headline K=512 engine (one ~110s tunnel compile), then runs the
bench's measured e2e section and prints the full result including
phase_seconds — for diagnosing pipelined-vs-sequential anomalies without a
full bench run.

Run: python tools/measure_e2e_phases.py   (real TPU, ~4-5 min)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import bench

    gex, cnv, cls = bench._synth()
    print("building headline engine (compile ~110s)...", flush=True)
    wall = bench.bench_tpu(gex, cnv, cls, k=512)
    print(f"headline K=512 round: {wall}", flush=True)
    r = bench.bench_e2e_pipelined()
    print(json.dumps(r, indent=2))


if __name__ == "__main__":
    main()
