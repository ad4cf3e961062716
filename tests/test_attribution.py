"""Attribution engine tests.

IG is validated through its defining properties instead of Captum (absent
here): exactness on linear models (attr == x * W) and the completeness axiom
(sum attr == f(x) - f(0)) on a trained nonlinear model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexynesis_tpu.data.importer import DataImporter
from flexynesis_tpu.interpret.attribution import (
    gradient_shap,
    integrated_gradients,
)
from flexynesis_tpu.models.direct_pred import DirectPred
from flexynesis_tpu.train.trainer import Trainer, train_val_split
from flexynesis_tpu.utils.synthetic import write_synthetic_folder


class TestIGProperties:
    def test_linear_model_exact(self, rng):
        W = jnp.asarray(rng.normal(size=(10, 3)).astype(np.float32))
        x = {"a": jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))}

        def forward(xs):
            return xs["a"] @ W

        attr = integrated_gradients(forward, x, 1, n_steps=5, single_output=False)
        np.testing.assert_allclose(
            np.asarray(attr["a"]), np.asarray(x["a"] * W[:, 1]), rtol=1e-4
        )

    def test_completeness_nonlinear(self, rng):
        W1 = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32) * 0.5)
        W2 = jnp.asarray(rng.normal(size=(16, 2)).astype(np.float32) * 0.5)
        x = {"a": jnp.asarray(rng.normal(size=(6, 8)).astype(np.float32))}

        def forward(xs):
            return jnp.tanh(xs["a"] @ W1) @ W2

        attr = integrated_gradients(forward, x, 0, n_steps=64, single_output=False)
        total = np.asarray(jnp.sum(attr["a"], axis=1))
        f_x = np.asarray(forward(x)[:, 0])
        f_0 = np.asarray(forward({"a": jnp.zeros_like(x["a"])})[:, 0])
        np.testing.assert_allclose(total, f_x - f_0, rtol=1e-3, atol=1e-4)

    def test_gradient_shap_linear_converges(self, rng):
        W = jnp.asarray(rng.normal(size=(10, 1)).astype(np.float32))
        x = {"a": jnp.asarray(rng.normal(size=(4, 10)).astype(np.float32))}

        def forward(xs):
            return xs["a"] @ W

        attr = gradient_shap(
            forward, x, 0, n_samples=64, single_output=True,
            rng=jax.random.key(0),
        )
        # linear model: every path gradient equals W -> attr == x * W
        np.testing.assert_allclose(
            np.asarray(attr["a"]), np.asarray(x["a"] * W[:, 0]), rtol=1e-3
        )


class TestModelImportance:
    @pytest.fixture(scope="class")
    def trained(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("attr")
        write_synthetic_folder(str(p), n_train=80, n_test=40, seed=5)
        imp = DataImporter(str(p), ["gex", "cnv"], top_percentile=50, min_features=20)
        train_ds, test_ds = imp.import_data()
        cfg = {
            "latent_dim": 16, "hidden_dim_factor": 0.3, "lr": 0.01,
            "supervisor_hidden_dim": 8, "epochs": 20, "batch_size": 32,
        }
        model = DirectPred(cfg, train_ds, target_variables=["subtype"])
        model.init_params(train_ds)
        tr, va = train_val_split(len(train_ds), 0.2)
        trainer = Trainer(model.loss_fn, lr=cfg["lr"])
        res = trainer.fit(
            model.params, model.batch_stats,
            model.make_batch(train_ds, tr), model.make_batch(train_ds, va),
            n_samples=len(tr), batch_size=32, max_epochs=20,
        )
        model.params, model.batch_stats = res.params, res.batch_stats
        return model, train_ds, test_ds

    def test_importance_dataframe(self, trained):
        model, train_ds, test_ds = trained
        df = model.compute_feature_importance(
            test_ds, "subtype", method="IntegratedGradients", steps_or_samples=10
        )
        n_class = model.output_dims["subtype"]
        n_feats = sum(len(v) for v in test_ds.features.values())
        assert len(df) == n_class * n_feats
        assert set(df.columns) == {
            "target_variable", "target_class", "target_class_label",
            "layer", "name", "importance",
        }
        assert (df["importance"] >= 0).all()
        assert df["importance"].sum() > 0
        assert "subtype" in model.feature_importances

    def test_importance_batching_invariance(self, trained):
        model, _, test_ds = trained
        df_full = model.compute_feature_importance(
            test_ds, "subtype", steps_or_samples=8, batch_size=512
        )
        df_batched = model.compute_feature_importance(
            test_ds, "subtype", steps_or_samples=8, batch_size=16
        )
        np.testing.assert_allclose(
            df_full["importance"].values,
            df_batched["importance"].values,
            rtol=1e-4, atol=1e-6,
        )

    def test_gradient_shap_method(self, trained):
        model, _, test_ds = trained
        df = model.compute_feature_importance(
            test_ds, "subtype", method="GradientShap", steps_or_samples=10
        )
        assert df["importance"].sum() > 0


class TestShardedAttribution:
    def test_sharded_matches_single_device_above_10k(self, rng):
        """VERDICT r1 item 5: attribution on a >10k-sample cohort WITHOUT
        subsampling, sample axis sharded over the 8-device mesh, matching
        the single-device result."""
        import jax

        from flexynesis_tpu.data.dataset import MultiOmicDataset
        from flexynesis_tpu.parallel.mesh import get_mesh

        n, gex, cnv, k = 10_250, 24, 12, 3  # > reference 10k cap, not 8-even
        cls = rng.integers(0, k, n).astype(np.float32)
        ds = MultiOmicDataset(
            dat={
                "gex": (rng.normal(size=(n, gex)) + cls[:, None]).astype(
                    np.float32
                ),
                "cnv": rng.normal(size=(n, cnv)).astype(np.float32),
            },
            ann={"subtype": cls},
            variable_types={"subtype": "categorical"},
            features={
                "gex": [f"g{i}" for i in range(gex)],
                "cnv": [f"c{i}" for i in range(cnv)],
            },
            samples=[f"S{i}" for i in range(n)],
            label_mappings={"subtype": {i: f"grp{i}" for i in range(k)}},
        )
        cfg = {
            "latent_dim": 8, "hidden_dim_factor": 0.3, "lr": 0.01,
            "supervisor_hidden_dim": 8, "epochs": 1, "batch_size": 32,
        }
        model = DirectPred(cfg, ds, target_variables=["subtype"])
        model.init_params(ds, seed=11)

        mesh = get_mesh((("data", len(jax.devices())),))
        df_sharded = model.compute_feature_importance(
            ds, "subtype", steps_or_samples=5, batch_size=2048, mesh=mesh
        )
        df_single = model.compute_feature_importance(
            ds, "subtype", steps_or_samples=5, batch_size=2048
        )
        np.testing.assert_allclose(
            df_sharded["importance"].values,
            df_single["importance"].values,
            rtol=1e-4, atol=1e-7,
        )
        assert len(df_sharded) == model.output_dims["subtype"] * (gex + cnv)


def _tiny_dataset(rng, n=48, gex=10, cnv=6, k=2):
    from flexynesis_tpu.data.dataset import MultiOmicDataset

    cls = rng.integers(0, k, n).astype(np.float32)
    return MultiOmicDataset(
        dat={
            "gex": (rng.normal(size=(n, gex)) + cls[:, None]).astype(np.float32),
            "cnv": rng.normal(size=(n, cnv)).astype(np.float32),
        },
        ann={"subtype": cls},
        variable_types={"subtype": "categorical"},
        features={
            "gex": [f"g{i}" for i in range(gex)],
            "cnv": [f"c{i}" for i in range(cnv)],
        },
        samples=[f"S{i}" for i in range(n)],
        label_mappings={"subtype": {i: f"grp{i}" for i in range(k)}},
    )


_TINY_CFG = {
    "latent_dim": 8, "hidden_dim_factor": 0.3, "lr": 0.01,
    "supervisor_hidden_dim": 8, "epochs": 1, "batch_size": 16,
}


class TestAttrProgramCaching:
    """The attribution jit program is cached ON the model instance and takes
    every array operand (params, inputs, _eval_extra_args) as jit ARGUMENTS:
    a module-level jit keyed by the bound method would retain every model
    ever attributed for the process lifetime, and closure-captured arrays
    (e.g. the GNN adjacency) inline into the HLO (HTTP 413 through the
    remote-compile tunnel at production graph sizes)."""

    def test_cache_lives_on_the_instance_and_reuses(self, rng):
        ds = _tiny_dataset(rng)
        models = []
        for seed in (0, 1):
            m = DirectPred(_TINY_CFG, ds, target_variables=["subtype"])
            m.init_params(ds, seed=seed)
            m.compute_feature_importance(ds, "subtype", steps_or_samples=4)
            models.append(m)
        assert models[0]._attr_jit_fn is not models[1]._attr_jit_fn
        # repeated calls with the same static config hit the compiled program
        models[0].compute_feature_importance(ds, "subtype", steps_or_samples=4)
        assert models[0]._attr_jit_fn._cache_size() == 1

    def test_gnn_adjacency_is_a_jit_argument(self, rng):
        import pandas as pd

        from flexynesis_tpu.data.dataset import MultiOmicDatasetNW
        from flexynesis_tpu.models.gnn import GNN

        ds = _tiny_dataset(rng)
        genes = list(ds.features["gex"]) + list(ds.features["cnv"])
        e = np.random.default_rng(3)
        df = pd.DataFrame({
            "protein1": e.choice(genes, 60),
            "protein2": e.choice(genes, 60),
            "score": e.random(60),
        })
        nw = MultiOmicDatasetNW(ds, df)
        cfg = dict(_TINY_CFG, node_embedding_dim=4, num_convs=1,
                   activation="relu")
        model = GNN(cfg, nw, target_variables=["subtype"])
        model.init_params(nw)
        df1 = model.compute_feature_importance(nw, "subtype",
                                               steps_or_samples=4)
        # a different operator must change the result WITHOUT a retrace —
        # proving the adjacency is a jit argument, not a baked-in constant
        model._adj = model._adj * 2.0
        df2 = model.compute_feature_importance(nw, "subtype",
                                               steps_or_samples=4)
        assert model._attr_jit_fn._cache_size() == 1
        assert not np.allclose(df1["importance"].values,
                               df2["importance"].values)
