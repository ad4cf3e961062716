"""GNN throughput at realistic STRING-graph scale (round-3 verdict item 6).

bench_gnn measures 300 nodes; real STRING subgraphs run 2-15k nodes
(reference data.py:1209-1248 builds the gene network from STRING edges;
modules.py:250 flattens nodes x emb into the readout FC). This script
measures trials/h and samples/s at >=2k nodes for BOTH readouts:

* ``flatten`` (the reference's formulation): fc consumes n_nodes * emb
  inputs — parameter count and activation width grow linearly in nodes;
* ``mean`` pooled readout (``gnn_readout=mean``): fc consumes emb inputs —
  the node-count-independent head for graphs where flatten doesn't fit.

The binding ceiling for the dense-operator formulation is the adjacency
itself: a dense (n, n) float32 operator costs n^2 * 4 bytes HBM
(2k -> 16 MB, 5k -> 100 MB, 10k -> 400 MB, 15k -> 900 MB) and every conv
costs batch * n^2 * emb MACs. 2k nodes ALSO proves the adjacency-as-
batch-argument contract at a size that inlining into HLO (the pre-round-4
closure-constant path) could not ship through the remote-compile tunnel
(HTTP 413 past ~10 MB).

Run on the real TPU: python tools/measure_gnn_scale.py
Each distinct program structure pays a ~110s tunnel compile; the script
keeps to one structure per (readout, K) arm.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_nw(n_samples: int, n_nodes: int, seed: int = 0):
    import pandas as pd

    from flexynesis_tpu.data.dataset import MultiOmicDataset, MultiOmicDatasetNW

    rng = np.random.default_rng(seed)
    cls = rng.integers(0, 4, n_samples)
    genes = [f"g{i}" for i in range(n_nodes)]
    X = (rng.normal(size=(n_samples, n_nodes)) + 0.4 * cls[:, None]).astype(
        np.float32
    )
    base = MultiOmicDataset(
        dat={"gex": X},
        ann={"subtype": cls.astype(np.float32)},
        variable_types={"subtype": "categorical"},
        features={"gex": genes},
        samples=[f"S{i}" for i in range(n_samples)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(4)}},
    )
    # ring + 2x random edges: ~STRING-like average degree at high confidence
    src = np.concatenate([
        np.arange(n_nodes),
        rng.integers(0, n_nodes, 2 * n_nodes),
    ])
    dst = np.concatenate([
        (np.arange(n_nodes) + 1) % n_nodes,
        rng.integers(0, n_nodes, 2 * n_nodes),
    ])
    edges = pd.DataFrame({
        "protein1": [genes[i] for i in src],
        "protein2": [genes[i] for i in dst],
    })
    return MultiOmicDatasetNW(base, edges)


def measure(n_nodes: int, readout: str, k: int, n: int = 512,
            epochs: int = 5, batch: int = 32, sparse: bool = False):
    from flexynesis_tpu.models.gnn import GNN
    from flexynesis_tpu.parallel.trials import ParallelTrials

    nw = build_nw(n, n_nodes)
    cfg = {
        "latent_dim": 32, "node_embedding_dim": 16, "num_convs": 2,
        "lr": 1e-3, "supervisor_hidden_dim": 16, "epochs": epochs,
        "batch_size": batch, "activation": "relu", "gnn_readout": readout,
        "gnn_sparse": sparse,
    }
    model = GNN(cfg, nw, target_variables=["subtype"], gnn_conv_type="GC")
    tr = np.arange(int(n * 0.8))
    va = np.arange(int(n * 0.8), n)
    pt = ParallelTrials(model, nw)
    lrs, seeds = np.full(k, 1e-3), np.arange(k)

    t0 = time.perf_counter()
    pt.run(lrs=lrs, seeds=seeds, train_idx=tr, val_idx=va, batch_size=batch,
           max_epochs=epochs, epochs_per_eval=epochs)  # compile warm-up
    compile_s = time.perf_counter() - t0

    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = pt.run(lrs=lrs, seeds=seeds, train_idx=tr, val_idx=va,
                     batch_size=batch, max_epochs=epochs,
                     epochs_per_eval=epochs)
        walls.append(time.perf_counter() - t0)
        assert np.all(np.isfinite(out["best_val_loss"]))
    wall = float(np.min(walls))
    steps = epochs * (len(tr) // batch)
    if sparse:
        # padded entries carry w == 0 exactly (build_sparse_operator), so
        # the nonzero count recovers the REAL edge count; report both so
        # the crossover table's storage column isn't inflated by the
        # pad_multiple=512 floor on small graphs (12B = 2x int32 + f32)
        padded_edges = int(model._adj["src"].shape[0])
        real_edges = int(np.count_nonzero(np.asarray(model._adj["w"])))
        adj_mb = round(real_edges * 12 / 1e6, 3)
        adj_mb_padded = round(padded_edges * 12 / 1e6, 3)
    else:
        padded_edges = real_edges = None
        adj_mb = adj_mb_padded = round(n_nodes * n_nodes * 4 / 1e6, 1)
    return {
        "n_nodes": n_nodes,
        "readout": readout,
        "sparse": sparse,
        "padded_edges": padded_edges,
        "real_edges": real_edges,
        "k_trials": k,
        "adjacency_mb": adj_mb,
        "adjacency_mb_padded": adj_mb_padded,
        "trials_per_hour": round(k * 3600.0 / wall, 1),
        "train_samples_per_sec": round(k * steps * batch / wall, 0),
        "wall_s": round(wall, 2),
        "compile_s": round(compile_s, 1),
    }


def main():
    results = []

    def arm(*args, **kw):
        r = measure(*args, **kw)
        results.append(r)
        print(json.dumps(r), file=sys.stderr, flush=True)
        return r

    # 2k nodes: the reference's flatten readout (dense only — head size is
    # the binding factor there, not aggregation), then the pooled readout
    # dense vs sparse (ring+2n random edges: ~0.15% density, so the dense
    # operator does ~650x the useful aggregation work)
    arm(2000, "flatten", k=8)
    arm(2000, "mean", k=8)
    arm(2000, "mean", k=8, sparse=True)
    # 4k nodes pooled: past the flatten head's comfort zone (fc rows 64k)
    arm(4000, "mean", k=4, n=256)
    arm(4000, "mean", k=4, n=256, sparse=True)
    # 8k nodes: dense operator alone is 256 MB x K stacked engines —
    # sparse-only territory
    arm(8000, "mean", k=4, n=256, sparse=True)
    print(json.dumps({"gnn_scale": results}))


if __name__ == "__main__":
    main()
