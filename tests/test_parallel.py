"""Parallel-trials + mesh sharding tests on the 8-virtual-device CPU mesh."""

import jax
import numpy as np
import pytest

from flexynesis_tpu.data.importer import DataImporter
from flexynesis_tpu.models.direct_pred import DirectPred
from flexynesis_tpu.parallel.mesh import get_mesh
from flexynesis_tpu.parallel.trials import ParallelTrials
from flexynesis_tpu.train.trainer import Trainer, train_val_split
from flexynesis_tpu.utils.synthetic import write_synthetic_folder

CFG = {
    "latent_dim": 16,
    "hidden_dim_factor": 0.3,
    "lr": 0.01,
    "supervisor_hidden_dim": 8,
    "epochs": 25,
    "batch_size": 32,
}


@pytest.fixture(scope="module")
def train_ds(tmp_path_factory):
    p = tmp_path_factory.mktemp("par")
    write_synthetic_folder(str(p), n_train=100, n_test=40, seed=13)
    imp = DataImporter(str(p), ["gex", "cnv"], top_percentile=50, min_features=20)
    train, _ = imp.import_data()
    return train


class TestParallelTrials:
    def test_vmapped_trials_match_sequential(self, train_ds):
        """A vmapped trial must reach a val loss comparable to the same
        config trained through the sequential Trainer."""
        model = DirectPred(CFG, train_ds, target_variables=["subtype"])
        tr, va = train_val_split(len(train_ds), 0.2)

        pt = ParallelTrials(model, train_ds)
        out = pt.run(
            lrs=np.array([0.01, 0.001]),
            seeds=np.array([42, 43]),
            train_idx=tr, val_idx=va, batch_size=32, max_epochs=25,
        )
        assert out["best_val_loss"].shape == (2,)
        assert np.all(np.isfinite(out["best_val_loss"]))

        seq = DirectPred(CFG, train_ds, target_variables=["subtype"])
        res = seq.fit(train_ds, tr, va, lr=0.01, batch_size=32, max_epochs=25)
        # same order of magnitude: both learn
        assert out["best_val_loss"][0] < res.history["val_loss"][0]

    def test_lr_differentiates_trials(self, train_ds):
        model = DirectPred(CFG, train_ds, target_variables=["subtype"])
        tr, va = train_val_split(len(train_ds), 0.2)
        pt = ParallelTrials(model, train_ds)
        out = pt.run(
            lrs=np.array([1e-2, 1e-6]),
            seeds=np.array([0, 0]),
            train_idx=tr, val_idx=va, batch_size=32, max_epochs=15,
        )
        # the near-zero-lr trial must be clearly worse
        assert out["best_val_loss"][0] < out["best_val_loss"][1]

    def test_trial_axis_sharded_over_mesh(self, train_ds):
        mesh = get_mesh((("trial", 8),))
        model = DirectPred(CFG, train_ds, target_variables=["subtype"])
        tr, va = train_val_split(len(train_ds), 0.2)
        pt = ParallelTrials(model, train_ds, mesh=mesh)
        out = pt.run(
            lrs=np.full(8, 0.01),
            seeds=np.arange(8),
            train_idx=tr, val_idx=va, batch_size=32, max_epochs=5,
        )
        assert out["best_val_loss"].shape == (8,)
        assert np.all(np.isfinite(out["best_val_loss"]))
        # different seeds -> different trajectories
        assert len(set(np.round(out["best_val_loss"], 6))) > 1

    def test_early_stop_all_trials(self, train_ds):
        model = DirectPred(CFG, train_ds, target_variables=["subtype"])
        tr, va = train_val_split(len(train_ds), 0.2)
        pt = ParallelTrials(model, train_ds)
        out = pt.run(
            lrs=np.array([0.05, 0.08]),  # aggressive lrs plateau fast
            seeds=np.array([1, 2]),
            train_idx=tr, val_idx=va, batch_size=32,
            max_epochs=500, early_stop_patience=3,
        )
        assert out["epochs_run"] < 500


class TestDataParallelTrainer:
    def test_fit_with_data_mesh(self, train_ds):
        """Single-model training with the batch sharded over an 8-device mesh."""
        mesh = get_mesh((("data", 8),))
        model = DirectPred(CFG, train_ds, target_variables=["subtype"])
        tr, va = train_val_split(len(train_ds), 0.2)
        res = model.fit(
            train_ds, tr, va, lr=0.01, batch_size=32, max_epochs=10,
            mesh=mesh,
        )
        assert np.isfinite(res.val_loss)
        assert res.val_loss < res.history["val_loss"][0]


class TestPartitionTrials:
    """Host-shard arithmetic for multi-host HPO fan-out (VERDICT r2 #9)."""

    def test_even_split(self):
        from flexynesis_tpu.parallel.distributed import partition_trials

        sugg = [{"i": i} for i in range(8)]
        shards = [partition_trials(sugg, pi, 4) for pi in range(4)]
        assert all(len(s) == 2 for s in shards)
        # disjoint + complete, order preserved within a shard
        flat = sorted((d["i"] for s in shards for d in s))
        assert flat == list(range(8))
        assert shards[1] == [{"i": 1}, {"i": 5}]

    def test_uneven_split_sizes_differ_by_at_most_one(self):
        from flexynesis_tpu.parallel.distributed import partition_trials

        sugg = [{"i": i} for i in range(10)]
        shards = [partition_trials(sugg, pi, 3) for pi in range(3)]
        sizes = [len(s) for s in shards]
        assert sizes == [4, 3, 3]
        assert sorted(d["i"] for s in shards for d in s) == list(range(10))

    def test_fewer_trials_than_hosts(self):
        from flexynesis_tpu.parallel.distributed import partition_trials

        sugg = [{"i": 0}, {"i": 1}]
        shards = [partition_trials(sugg, pi, 8) for pi in range(8)]
        assert shards[0] == [{"i": 0}] and shards[1] == [{"i": 1}]
        assert all(s == [] for s in shards[2:])

    def test_empty_batch(self):
        from flexynesis_tpu.parallel.distributed import partition_trials

        assert partition_trials([], 3, 5) == []

    def test_out_of_range_index_raises(self):
        from flexynesis_tpu.parallel.distributed import partition_trials

        with pytest.raises(ValueError):
            partition_trials([{"i": 0}], 5, 4)

    def test_defaults_use_live_topology(self):
        from flexynesis_tpu.parallel.distributed import partition_trials

        sugg = [{"i": i} for i in range(3)]
        # single-process test env: identity partition
        assert partition_trials(sugg) == sugg


class TestAutoTrialMesh:
    """HPO rounds auto-shard their trial axis over the visible devices
    (8 virtual CPU devices in tests) whenever the trial count divides."""

    def _tuner(self, train_ds, **kw):
        from flexynesis_tpu.train.hpo import HyperparameterTuning

        return HyperparameterTuning(
            train_ds, DirectPred, "DirectPred",
            target_variables=["subtype"], n_iter=1, **kw,
        )

    def test_trial_mesh_policy(self, train_ds):
        tuner = self._tuner(train_ds)
        assert tuner._trial_mesh(8) is not None     # 8 % 8 == 0
        assert tuner._trial_mesh(40) is not None    # 8 suggestions x 5 folds
        assert tuner._trial_mesh(7) is None         # uneven -> plain vmap
        assert tuner._trial_mesh(4) is None

    def test_explicit_mesh_wins(self, train_ds):
        mesh = get_mesh((("trial", 8),))
        tuner = self._tuner(train_ds, mesh=mesh)
        assert tuner._trial_mesh(16) is mesh
        assert tuner._trial_mesh(3) is None

    def test_sharded_group_trains(self, train_ds):
        """An 8-suggestion same-arch round engages the mesh and converges."""
        tuner = self._tuner(train_ds)
        base = {"latent_dim": 16, "lr": 1e-3, "hidden_dim_factor": 0.3,
                "supervisor_hidden_dim": 8, "epochs": 8, "batch_size": 32}
        group = [dict(base, lr=l) for l in np.geomspace(1e-4, 1e-2, 8)]
        assert tuner._trial_mesh(len(group)) is not None
        results = tuner._run_parallel_group(group)
        assert len(results) == 8
        assert all(np.isfinite(l) for l, _, _ in results)

    def test_sharded_fused_cv_matches_unsharded(self, train_ds):
        """8 suggestions x 5 folds = 40 trials shard over 8 devices; the
        per-suggestion fold-means must match the unsharded program."""
        tuner = self._tuner(train_ds, use_cv=True, cv_splits=5)
        base = {"latent_dim": 16, "lr": 1e-3, "hidden_dim_factor": 0.3,
                "supervisor_hidden_dim": 8, "epochs": 4, "batch_size": 32}
        group = [dict(base, lr=l) for l in np.geomspace(1e-4, 1e-2, 8)]
        sharded = tuner._run_parallel_group_cv(group)

        tuner_nomesh = self._tuner(train_ds, use_cv=True, cv_splits=5)
        tuner_nomesh._trial_mesh = lambda n: None
        unsharded = tuner_nomesh._run_parallel_group_cv(group)
        for (a, _, _), (b, _, _) in zip(sharded, unsharded):
            np.testing.assert_allclose(a, b, rtol=2e-3)


class TestGridEngineCache:
    """Round-3: jitted grid engines are reused across rounds (a re-trace
    costs ~110s of remote compile per round on the real tunnel)."""

    def test_engine_identity_per_model_and_config(self, train_ds):
        from flexynesis_tpu.parallel import trials as trials_mod

        model = DirectPred(CFG, train_ds, target_variables=["subtype"])
        e1 = trials_mod._get_grid_engine(model, "bfloat16", "float32", 32, 80, 2)
        e2 = trials_mod._get_grid_engine(model, "bfloat16", "float32", 32, 80, 2)
        assert e1 is e2
        # different trace-relevant config -> different engine
        e3 = trials_mod._get_grid_engine(model, "bfloat16", "bfloat16_sr", 32, 80, 2)
        assert e3 is not e1
        # different model object -> different engine (weak key)
        other = DirectPred(CFG, train_ds, target_variables=["subtype"])
        e4 = trials_mod._get_grid_engine(other, "bfloat16", "float32", 32, 80, 2)
        assert e4 is not e1

    def test_hpo_templates_cached_across_rounds(self, train_ds):
        from flexynesis_tpu.train.hpo import HyperparameterTuning

        tuner = HyperparameterTuning(
            train_ds, DirectPred, "DirectPred",
            target_variables=["subtype"], n_iter=1,
        )
        a = {"latent_dim": 16, "lr": 1e-3, "hidden_dim_factor": 0.3,
             "supervisor_hidden_dim": 8, "epochs": 5, "batch_size": 32}
        assert tuner._get_template(a) is tuner._get_template(dict(a, lr=5e-3))
        assert tuner._get_template(a) is not tuner._get_template(
            dict(a, latent_dim=32)
        )
