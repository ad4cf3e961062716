"""Trial-round checkpointing: a killed ParallelTrials round resumes
mid-round and reproduces the uninterrupted run exactly; stale or foreign
checkpoints are ignored; completed rounds clean up after themselves."""

import numpy as np
import pytest

from flexynesis_tpu.data.dataset import MultiOmicDataset
from flexynesis_tpu.models.direct_pred import DirectPred
from flexynesis_tpu.parallel.trials import ParallelTrials


@pytest.fixture
def setup(rng):
    n, f = 96, 16
    cls = rng.integers(0, 2, n)
    X = (rng.normal(size=(n, f)) + 1.2 * cls[:, None]).astype(np.float32)
    ds = MultiOmicDataset(
        dat={"gex": X},
        ann={"y": cls.astype(np.float32)},
        variable_types={"y": "categorical"},
        features={"gex": [f"g{i}" for i in range(f)]},
        samples=[f"S{i}" for i in range(n)],
        label_mappings={"y": {0: "a", 1: "b"}},
    )
    cfg = {"latent_dim": 8, "hidden_dim_factor": 0.5, "lr": 5e-3,
           "supervisor_hidden_dim": 8, "epochs": 12, "batch_size": 32}
    return ds, cfg


def _run(ds, cfg, ckpt=None, die_after_chunks=None):
    model = DirectPred(cfg, ds, target_variables=["y"])
    pt = ParallelTrials(model, ds)
    if die_after_chunks is not None:
        pt._build()
        real = pt._train_chunk
        calls = {"n": 0}

        def dying(*a, **k):
            calls["n"] += 1
            if calls["n"] > die_after_chunks:
                raise KeyboardInterrupt("simulated preemption")
            return real(*a, **k)

        pt._train_chunk = dying
    return pt.run(
        lrs=np.full(2, 5e-3), seeds=np.arange(2),
        train_idx=np.arange(72), val_idx=np.arange(72, 96),
        batch_size=32, max_epochs=12, epochs_per_eval=4,
        checkpoint_dir=ckpt,
    )


def test_resume_matches_uninterrupted(setup, tmp_path, capsys):
    ds, cfg = setup
    full = _run(ds, cfg)

    ckpt = str(tmp_path / "round")
    with pytest.raises(KeyboardInterrupt):  # dies 8 epochs into 12
        _run(ds, cfg, ckpt=ckpt, die_after_chunks=2)
    resumed = _run(ds, cfg, ckpt=ckpt)  # same round: picks up at epoch 8
    assert "Resumed trial round from epoch 8" in capsys.readouterr().out

    np.testing.assert_allclose(
        resumed["best_val_loss"], full["best_val_loss"], rtol=1e-5
    )
    np.testing.assert_array_equal(resumed["best_epoch"], full["best_epoch"])
    assert resumed["epochs_run"] == 12


def test_foreign_round_starts_fresh(setup, tmp_path, capsys):
    ds, cfg = setup
    ckpt = str(tmp_path / "round")
    with pytest.raises(KeyboardInterrupt):
        _run(ds, cfg, ckpt=ckpt, die_after_chunks=1)
    # same shapes but a different suggestion round (other lrs): must not
    # resume the stale state
    model = DirectPred(cfg, ds, target_variables=["y"])
    pt = ParallelTrials(model, ds)
    out = pt.run(
        lrs=np.full(2, 1e-3), seeds=np.arange(2),
        train_idx=np.arange(72), val_idx=np.arange(72, 96),
        batch_size=32, max_epochs=4, epochs_per_eval=4,
        checkpoint_dir=ckpt,
    )
    assert "not resumable" in capsys.readouterr().out
    assert out["epochs_run"] == 4
    assert np.all(np.isfinite(out["best_val_loss"]))


def test_completed_round_cleans_up(setup, tmp_path):
    ds, cfg = setup
    ckpt = str(tmp_path / "round")
    _run(ds, cfg, ckpt=ckpt)  # completes normally
    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(ckpt)
    assert mgr.latest_step() is None  # checkpoint removed on completion
    mgr.close()
