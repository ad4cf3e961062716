"""Orbax train-state checkpoint/resume + profiling utilities."""

import os

import jax
import numpy as np
import pytest

from flexynesis_tpu.data.importer import DataImporter
from flexynesis_tpu.models.direct_pred import DirectPred
from flexynesis_tpu.train.trainer import Trainer, train_val_split
from flexynesis_tpu.utils.synthetic import write_synthetic_folder

CFG = {
    "latent_dim": 16, "hidden_dim_factor": 0.3, "lr": 0.01,
    "supervisor_hidden_dim": 8, "epochs": 12, "batch_size": 32,
}


@pytest.fixture(scope="module")
def train_ds(tmp_path_factory):
    p = tmp_path_factory.mktemp("ckpt_data")
    write_synthetic_folder(str(p), n_train=80, n_test=40, seed=17)
    imp = DataImporter(str(p), ["gex"], top_percentile=50, min_features=20)
    return imp.import_data()[0]


class TestTrainCheckpoint:
    def test_save_and_resume(self, train_ds, tmp_path):
        ckpt_dir = str(tmp_path / "ckpts")
        tr, va = train_val_split(len(train_ds), 0.2)

        def run(max_epochs):
            model = DirectPred(CFG, train_ds, target_variables=["subtype"])
            model.init_params(train_ds)
            trainer = Trainer(model.loss_fn, lr=0.01)
            return trainer.fit(
                model.params, model.batch_stats,
                model.make_batch(train_ds, tr), model.make_batch(train_ds, va),
                n_samples=len(tr), batch_size=32, max_epochs=max_epochs,
                rng=jax.random.key(0),
                checkpoint_dir=ckpt_dir, checkpoint_every=4,
            )

        # phase 1: train 8 epochs (checkpoints at 4 and 8)
        res1 = run(8)
        assert res1.epochs_run == 8
        assert os.path.exists(ckpt_dir) and os.listdir(ckpt_dir)

        # phase 2 ("after preemption"): resumes at epoch 8, runs 4 more
        res2 = run(12)
        assert res2.epochs_run == 12
        assert len(res2.history["val_loss"]) == 4  # only epochs 8..11 ran
        assert np.isfinite(res2.val_loss)


class TestProfiling:
    def test_phase_timer(self, tmp_path):
        from flexynesis_tpu.utils.profiling import PhaseTimer

        t = PhaseTimer()
        with t.phase("alpha"):
            sum(range(1000))
        with t.phase("beta"):
            pass
        out = str(tmp_path / "profile.json")
        t.report(out)
        assert os.path.exists(out)
        assert set(t.phases) == {"alpha", "beta"}

    def test_disabled_timer_noop(self):
        from flexynesis_tpu.utils.profiling import PhaseTimer

        t = PhaseTimer(enabled=False)
        with t.phase("x"):
            pass
        assert not t.phases


class TestParallelFineTuner:
    def test_parallel_grid_matches_sequential_choice_quality(self, train_ds, tmp_path):
        import jax

        from flexynesis_tpu.train.finetune import FineTuner

        model = DirectPred(CFG, train_ds, target_variables=["subtype"])
        model.fit(train_ds, lr=0.01, batch_size=32, max_epochs=10)
        base_preds = model.predict(train_ds)

        ft_ds = train_ds.subset(np.arange(30))
        tuner = FineTuner(model, ft_ds, n_splits=3, max_epochs=8,
                          early_stop_patience=3)
        tuned = tuner.run_experiments(parallel=True)
        assert tuned.params is not None
        preds = tuned.predict(train_ds)
        assert np.isfinite(preds["subtype"]).all()
