"""Measure the two model families without a bench.py section: trial-engine
throughput for MultiTripletNetwork and CrossModalPred, each vs an
equivalent torch-CPU single trial (same shapes / optimizer / schedule, the
reference's per-trial work — reference triplet_encoder.py / crossmodal_pred.py
under main.py setup_trainer, devices=1).

Mirrors bench.py's bench_vae/bench_gnn recipe at the same synthetic scale
(n=1000 samples, gex=1000 + cnv=500 features, batch 64, 10 epochs):
* MultiTripletNetwork: K vmapped trials; each step samples fresh pos/neg
  on device and runs one stacked 3B-row forward (anchor+pos+neg), squared-
  distance triplet margin loss + CE head on anchors. The torch arm stacks
  the same 3B rows through one BN pass (the framework's documented BN
  deviation) with host numpy pos/neg sampling.
* CrossModalPred gex->cnv (the reference CI's translation direction,
  models-template.yml:83-87): encode gex, reconstruct cnv; per-output-layer
  MMD(z, 200 prior draws) + recon MSE + CE head.

Run ON THE REAL TPU (no env vars). Prints one JSON dict per family with
trials/hour both arms and the speedup. Each engine shape pays a one-off
~110s remote-compile through the tunnel (excluded: timing starts after the
warm-up run). Usage: python tools/measure_zoo_trials.py  [ZOO_K=512]
[ZOO_EPOCHS=10] [ZOO_FAMILIES=triplet,crossmodal]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N, G, C, N_CLASSES = 1000, 1000, 500, 4
LATENT, HIDDEN_FACTOR, SUP_HIDDEN, BATCH = 32, 0.3, 16, 64
K = int(os.environ.get("ZOO_K", 512))
EPOCHS = int(os.environ.get("ZOO_EPOCHS", 10))


def _synth():
    rng = np.random.default_rng(3)
    cls = rng.integers(0, N_CLASSES, N)
    gex = (rng.normal(size=(N, G)) + 0.5 * cls[:, None]).astype(np.float32)
    cnv = (rng.normal(size=(N, C)) + 0.3 * cls[:, None]).astype(np.float32)
    return gex, cnv, cls


def _dataset(gex, cnv, cls):
    from flexynesis_tpu.data.dataset import MultiOmicDataset

    return MultiOmicDataset(
        dat={"gex": gex, "cnv": cnv},
        ann={"subtype": cls.astype(np.float32)},
        variable_types={"subtype": "categorical"},
        features={"gex": [f"g{i}" for i in range(G)],
                  "cnv": [f"c{i}" for i in range(C)]},
        samples=[f"S{i}" for i in range(N)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(N_CLASSES)}},
    )


def _time_engine(model, ds, n_train):
    from flexynesis_tpu.parallel.trials import ParallelTrials

    tr = np.arange(int(n_train * 0.8))
    va = np.arange(int(n_train * 0.8), n_train)
    pt = ParallelTrials(model, ds)
    lrs, seeds = np.full(K, 1e-3), np.arange(K)
    kw = dict(train_idx=tr, val_idx=va, batch_size=BATCH,
              max_epochs=EPOCHS, epochs_per_eval=EPOCHS)
    pt.run(lrs=lrs, seeds=seeds, **kw)  # compile warm-up
    walls = []
    for _ in range(2):
        t0 = time.perf_counter()
        out = pt.run(lrs=lrs, seeds=seeds, **kw)
        walls.append(time.perf_counter() - t0)
        assert np.all(np.isfinite(out["best_val_loss"]))
    return float(np.min(walls))


def measure_triplet(gex, cnv, cls):
    import torch
    import torch.nn as nn

    from flexynesis_tpu.models.triplet_encoder import MultiTripletNetwork

    ds = _dataset(gex, cnv, cls)
    cfg = {"latent_dim": LATENT, "hidden_dim_factor": HIDDEN_FACTOR,
           "lr": 1e-3, "supervisor_hidden_dim": SUP_HIDDEN, "epochs": EPOCHS,
           "batch_size": BATCH}
    model = MultiTripletNetwork(cfg, ds, target_variables=["subtype"])
    tpu_wall = _time_engine(model, ds, model.n_train_samples())

    # torch-CPU single-trial equivalent (stacked 3B-row forward, one BN)
    def mlp(i, h, o):
        return nn.Sequential(nn.Linear(i, h), nn.BatchNorm1d(h), nn.ReLU(),
                             nn.Dropout(0.1), nn.Linear(h, o))

    H1, H2 = int(G * HIDDEN_FACTOR), int(C * HIDDEN_FACTOR)
    e1, e2 = mlp(G, H1, LATENT), mlp(C, H2, LATENT)
    fuse = nn.Linear(2 * LATENT, LATENT)
    head = mlp(LATENT, SUP_HIDDEN, N_CLASSES)
    params = (list(e1.parameters()) + list(e2.parameters())
              + list(fuse.parameters()) + list(head.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)
    ce = nn.CrossEntropyLoss()
    ta, tb = torch.tensor(gex), torch.tensor(cnv)
    ty = torch.tensor(cls).long()
    groups = [np.where(cls == g)[0] for g in range(N_CLASSES)]
    rng = np.random.default_rng(0)

    nb = N // BATCH
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        perm = rng.permutation(N)[: nb * BATCH].reshape(nb, BATCH)
        for anchor in perm:
            agrp = cls[anchor]
            pos = np.array([rng.choice(groups[g]) for g in agrp])
            ngr = (agrp + rng.integers(1, N_CLASSES, BATCH)) % N_CLASSES
            neg = np.array([rng.choice(groups[g]) for g in ngr])
            idx3 = np.concatenate([anchor, pos, neg])
            t3a, t3b = ta[idx3], tb[idx3]
            opt.zero_grad()
            emb = fuse(torch.cat([e1(t3a), e2(t3b)], dim=1))
            a, p, n_ = emb[:BATCH], emb[BATCH:2 * BATCH], emb[2 * BATCH:]
            d_pos = ((a - p) ** 2).sum(1)
            d_neg = ((a - n_) ** 2).sum(1)
            loss = torch.clamp(d_pos - d_neg + 1.0, min=0.0).mean()
            loss = loss + ce(head(a), ty[anchor])
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params, 1.0)
            opt.step()
    torch_wall = time.perf_counter() - t0
    return {"tpu_trials_per_hour": round(K * 3600.0 / tpu_wall, 1),
            "torch_cpu_trials_per_hour": round(3600.0 / torch_wall, 1),
            "speedup": round(K * torch_wall / tpu_wall, 2),
            "k_trials": K}


def measure_crossmodal(gex, cnv, cls):
    import torch
    import torch.nn as nn

    from flexynesis_tpu.models.crossmodal_pred import CrossModalPred

    ds = _dataset(gex, cnv, cls)
    cfg = {"latent_dim": LATENT, "hidden_dim_factor": HIDDEN_FACTOR,
           "lr": 1e-3, "supervisor_hidden_dim": SUP_HIDDEN, "epochs": EPOCHS,
           "batch_size": BATCH}
    model = CrossModalPred(cfg, ds, target_variables=["subtype"],
                           input_layers=["gex"], output_layers=["cnv"])
    tpu_wall = _time_engine(model, ds, N)

    # torch-CPU single trial: encode gex -> z -> decode cnv, MMD + MSE + CE
    H1, H2 = int(G * HIDDEN_FACTOR), int(C * HIDDEN_FACTOR)

    class Enc(nn.Module):
        def __init__(self, i, h):
            super().__init__()
            self.net = nn.Sequential(nn.Linear(i, h), nn.BatchNorm1d(h),
                                     nn.LeakyReLU(0.2), nn.Dropout(0.1))
            self.mu, self.lv = nn.Linear(h, LATENT), nn.Linear(h, LATENT)

        def forward(self, x):
            h = self.net(x)
            return self.mu(h), self.lv(h)

    enc = Enc(G, H1)
    fm, fv = nn.Linear(LATENT, LATENT), nn.Linear(LATENT, LATENT)
    dec = nn.Sequential(nn.Linear(LATENT, H2), nn.BatchNorm1d(H2),
                        nn.LeakyReLU(0.2), nn.Linear(H2, C))
    head = nn.Sequential(nn.Linear(LATENT, SUP_HIDDEN),
                         nn.BatchNorm1d(SUP_HIDDEN), nn.ReLU(),
                         nn.Linear(SUP_HIDDEN, N_CLASSES))
    params = (list(enc.parameters()) + list(fm.parameters())
              + list(fv.parameters()) + list(dec.parameters())
              + list(head.parameters()))
    opt = torch.optim.Adam(params, lr=1e-3)
    ce = nn.CrossEntropyLoss()
    ta, tb = torch.tensor(gex), torch.tensor(cnv)
    ty = torch.tensor(cls).long()

    def mmd(x, y):
        def k(a, b):
            d = a.shape[1]
            sq = torch.cdist(a, b) ** 2
            return torch.exp(-sq / (d * float(d))).mean()
        return k(x, x) + k(y, y) - 2 * k(x, y)

    nb = N // BATCH
    t0 = time.perf_counter()
    for _ in range(EPOCHS):
        perm = torch.randperm(N)[: nb * BATCH].reshape(nb, BATCH)
        for idx in perm:
            opt.zero_grad()
            m, v = enc(ta[idx])
            mu, lv = fm(m), fv(v)
            z = mu + lv * torch.randn_like(lv)
            prior = torch.randn(200, LATENT)
            loss = mmd(prior, z) + ((dec(z) - tb[idx]) ** 2).mean()
            loss = loss + ce(head(z), ty[idx])
            loss.backward()
            torch.nn.utils.clip_grad_norm_(params, 1.0)
            opt.step()
    torch_wall = time.perf_counter() - t0
    return {"tpu_trials_per_hour": round(K * 3600.0 / tpu_wall, 1),
            "torch_cpu_trials_per_hour": round(3600.0 / torch_wall, 1),
            "speedup": round(K * torch_wall / tpu_wall, 2),
            "k_trials": K}


def main():
    fams = os.environ.get("ZOO_FAMILIES", "triplet,crossmodal").split(",")
    gex, cnv, cls = _synth()
    out = {}
    if "triplet" in fams:
        out["triplet"] = measure_triplet(gex, cnv, cls)
        print(json.dumps({"triplet": out["triplet"]}), flush=True)
    if "crossmodal" in fams:
        out["crossmodal"] = measure_crossmodal(gex, cnv, cls)
        print(json.dumps({"crossmodal": out["crossmodal"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
