"""One-off REAL torch-CPU baselines for the two bench sections whose
speedups previously rested on extrapolated costs (round-4 verdict, weak #2):

* fine-tuner: the FULL sequential 45-cell grid (3 lr x 3 freeze x 5 folds
  on 256 samples, batch 32, per-epoch val eval with early-stop patience 3)
  plus the final full-data fit — the reference's sequential fine-tuning
  loop (reference main.py:568-659), measured end to end rather than
  "one cell x 45".
* IG attribution: captum-equivalent integrated gradients over the FULL
  2000-sample cohort (25 steps, all 4 classes, same MLP shapes as
  bench.bench_ig) — measured directly rather than 256 samples scaled.

Runs on the container CPU only (torch never touches the TPU tunnel, but
keep it the only python process — sitecustomize still registers the
tunnel). Prints one JSON dict; the measured totals live in bench.py as
``_TORCH_MEASURED`` with this file as provenance.

Usage: python tools/measure_torch_baselines.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (bench-shape constants + synthetic generator)


def measure_finetuner_grid(n_finetune=256, epochs=10, batch=32, folds=5,
                           patience=3):
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    gex, cnv, cls = bench._synth()
    gex, cnv, cls = gex[:n_finetune], cnv[:n_finetune], cls[:n_finetune]

    G, C = bench.GEX, bench.CNV
    L, SH, NC = bench.LATENT, bench.SUP_HIDDEN, bench.N_CLASSES
    HF = bench.HIDDEN_FACTOR

    def mlp(i, h, o):
        return nn.Sequential(nn.Linear(i, h), nn.BatchNorm1d(h), nn.ReLU(),
                             nn.Dropout(0.1), nn.Linear(h, o))

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.e1 = mlp(G, int(G * HF), L)
            self.e2 = mlp(C, int(C * HF), L)
            self.fuse = nn.Linear(2 * L, L)
            self.head = mlp(L, SH, NC)

        def forward(self, a, b):
            return self.head(self.fuse(
                torch.cat([self.e1(a), self.e2(b)], dim=1)))

    ta, tb = torch.tensor(gex), torch.tensor(cnv)
    ty = torch.tensor(cls).long()
    ce = nn.CrossEntropyLoss()

    # equal-size folds over a trimmed multiple of `folds`, like
    # train/finetune.py's kfold_indices
    n = (n_finetune // folds) * folds
    fold_idx = np.arange(n).reshape(folds, -1)
    lrs = [1e-3, 1e-4, 1e-5]
    freezes = [{"enc": True, "sup": False}, {"enc": False, "sup": True},
               {"enc": False, "sup": False}]

    def run_cell(lr, freeze, tr, va, max_epochs):
        net = Net()
        for name, p in net.named_parameters():
            if freeze["enc"] and (name.startswith("e1") or name.startswith("e2")):
                p.requires_grad_(False)
            if freeze["sup"] and name.startswith("head"):
                p.requires_grad_(False)
        trainable = [p for p in net.parameters() if p.requires_grad]
        opt = torch.optim.Adam(trainable, lr=lr)
        best, bad, stop_epoch = float("inf"), 0, max_epochs
        nb = max(1, len(tr) // batch)
        for ep in range(max_epochs):
            net.train()
            perm = torch.randperm(len(tr))[: nb * batch].reshape(nb, batch)
            for rows in perm:
                idx = tr[rows]
                opt.zero_grad()
                loss = ce(net(ta[idx], tb[idx]), ty[idx])
                loss.backward()
                torch.nn.utils.clip_grad_norm_(trainable, 1.0)
                opt.step()
            if va is None:
                continue
            net.eval()
            with torch.no_grad():
                vl = float(ce(net(ta[va], tb[va]), ty[va]))
            if vl < best - 1e-6:
                best, bad, stop_epoch = vl, 0, ep + 1
            else:
                bad += 1
                if bad >= patience:
                    break
        return best, stop_epoch

    t0 = time.perf_counter()
    cells = 0
    results = {}
    for lr in lrs:
        for fz in freezes:
            vals, stops = [], []
            for f in range(folds):
                va = torch.tensor(fold_idx[f])
                tr = torch.tensor(np.concatenate(
                    [fold_idx[g] for g in range(folds) if g != f]))
                v, s = run_cell(lr, fz, tr, va, epochs)
                vals.append(v)
                stops.append(s)
                cells += 1
            results[(lr, fz["enc"], fz["sup"])] = (
                float(np.mean(vals)), int(round(float(np.mean(stops)))))
    # final full-data fit at the best cell's lr/freeze/avg-stop-epoch,
    # mirroring FineTuner.run_experiments' final fit
    (lr, enc, sup), (_, ep_final) = min(results.items(), key=lambda kv: kv[1][0])
    run_cell(lr, {"enc": enc, "sup": sup}, torch.arange(n), None, ep_final)
    wall = time.perf_counter() - t0
    return {"torch_grid45_plus_final_s": round(wall, 2), "grid_cells": cells,
            "n_finetune": n_finetune, "epochs": epochs, "patience": patience}


def measure_ig_full_cohort():
    import torch
    import torch.nn as nn

    torch.set_num_threads(max(1, os.cpu_count() or 1))
    gex, cnv, _cls = bench._synth()
    G, C = bench.GEX, bench.CNV
    L, SH, NC = bench.LATENT, bench.SUP_HIDDEN, bench.N_CLASSES
    HF = bench.HIDDEN_FACTOR

    def mlp(i, h, o):
        return nn.Sequential(nn.Linear(i, h), nn.BatchNorm1d(h), nn.ReLU(),
                             nn.Dropout(0.1), nn.Linear(h, o))

    net = nn.ModuleDict({
        "e1": mlp(G, int(G * HF), L),
        "e2": mlp(C, int(C * HF), L),
        "fuse": nn.Linear(2 * L, L),
        "head": mlp(L, SH, NC),
    }).eval()

    def fwd(a, b):
        return net["head"](net["fuse"](
            torch.cat([net["e1"](a), net["e2"](b)], dim=1)))

    # full cohort in one shot would build a 2000x2000 graph per alpha —
    # captum batches internally; batch 512 mirrors bench_ig's TPU arm
    xa_all, xb_all = torch.tensor(gex), torch.tensor(cnv)
    alphas = torch.linspace(0, 1, 25)
    bsz = 512
    t0 = time.perf_counter()
    for cls_i in range(NC):
        for s in range(0, len(xa_all), bsz):
            xa, xb = xa_all[s:s + bsz], xb_all[s:s + bsz]
            ba, bb = torch.zeros_like(xa), torch.zeros_like(xb)
            total_a, total_b = torch.zeros_like(xa), torch.zeros_like(xb)
            for al in alphas:
                ia = (ba + al * (xa - ba)).requires_grad_(True)
                ib = (bb + al * (xb - bb)).requires_grad_(True)
                out = fwd(ia, ib)[:, cls_i].sum()
                ga, gb = torch.autograd.grad(out, (ia, ib))
                total_a += ga
                total_b += gb
    wall = time.perf_counter() - t0
    return {"torch_ig_full_cohort_s": round(wall, 2),
            "n_samples": int(len(xa_all)), "steps": 25, "classes": NC}


def main():
    out = {"finetuner": measure_finetuner_grid()}
    print(json.dumps({"finetuner": out["finetuner"]}), flush=True)
    out["ig"] = measure_ig_full_cohort()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
