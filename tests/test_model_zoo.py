"""Model zoo tests: supervised_vae, CrossModalPred, MultiTripletNetwork, GNN.

Each mirrors a reference CI scenario (models-template.yml:77-100)."""

import numpy as np
import pandas as pd
import pytest

from flexynesis_tpu.data.dataset import MultiOmicDatasetNW
from flexynesis_tpu.data.importer import DataImporter
from flexynesis_tpu.models import (
    GNN,
    CrossModalPred,
    MultiTripletNetwork,
    SupervisedVAE,
)
from flexynesis_tpu.utils.synthetic import write_synthetic_folder

CFG = {
    "latent_dim": 16,
    "hidden_dim_factor": 0.3,
    "lr": 0.01,
    "supervisor_hidden_dim": 8,
    "epochs": 40,
    "batch_size": 32,
}


@pytest.fixture(scope="module")
def datasets(tmp_path_factory):
    p = tmp_path_factory.mktemp("zoo")
    write_synthetic_folder(str(p), n_train=100, n_test=50, seed=11)
    imp = DataImporter(str(p), ["gex", "cnv"], top_percentile=50, min_features=20)
    return imp.import_data()


def _train(model, ds, epochs=40):
    from flexynesis_tpu.train.trainer import train_val_split

    n = model.n_train_samples(ds) if hasattr(model, "n_train_samples") else len(ds)
    tr, va = train_val_split(n, 0.2)
    res = model.fit(
        ds, tr, va, lr=CFG["lr"], batch_size=32, max_epochs=epochs,
        early_stop_patience=-1,
    )
    return res


class TestSupervisedVAE:
    def test_multi_target_train(self, datasets):
        train_ds, test_ds = datasets
        model = SupervisedVAE(
            CFG, train_ds, target_variables=["subtype", "age"]
        )
        res = _train(model, train_ds)
        assert res.val_loss < res.history["val_loss"][0]
        preds = model.predict(test_ds)
        assert preds["subtype"].shape[1] == model.output_dims["subtype"]
        emb = model.transform(test_ds)
        assert emb.shape == (len(test_ds), CFG["latent_dim"])
        # deterministic eval embeddings (z == mean)
        emb2 = model.transform(test_ds)
        pd.testing.assert_frame_equal(emb, emb2)

    def test_mmd_loss_present(self, datasets):
        train_ds, _ = datasets
        model = SupervisedVAE(CFG, train_ds, target_variables=["subtype"])
        model.init_params(train_ds)
        batch = model.make_batch(train_ds, np.arange(32))
        import jax

        total, (losses, _) = model.loss_fn(
            model.params, model.batch_stats, batch, jax.random.key(0), True
        )
        assert "mmd_loss" in losses
        assert np.isfinite(float(total))


class TestCrossModalPred:
    def test_translation_and_decode(self, datasets):
        train_ds, test_ds = datasets
        model = CrossModalPred(
            CFG, train_ds, target_variables=["subtype"],
            input_layers=["gex"], output_layers=["cnv"],
        )
        res = _train(model, train_ds)
        assert np.isfinite(res.val_loss)
        decoded = model.decode(test_ds)
        assert set(decoded) == {"cnv"}
        assert decoded["cnv"].shape == (
            len(test_ds), len(test_ds.features["cnv"])
        )
        assert list(decoded["cnv"].columns) == list(test_ds.features["cnv"])
        # sigmoid output range
        assert decoded["cnv"].values.min() >= 0.0
        assert decoded["cnv"].values.max() <= 1.0
        # attribution runs over input layers only
        df = model.compute_feature_importance(test_ds, "subtype", steps_or_samples=5)
        assert set(df["layer"]) == {"gex"}


class TestMultiTripletNetwork:
    def test_triplet_training(self, datasets):
        train_ds, test_ds = datasets
        model = MultiTripletNetwork(CFG, train_ds, target_variables=["subtype"])
        res = _train(model, train_ds)
        assert res.val_loss < res.history["val_loss"][0]
        preds = model.predict(test_ds)
        assert preds["subtype"].shape[0] == len(test_ds)

    def test_requires_categorical_first_target(self, datasets):
        train_ds, _ = datasets
        with pytest.raises(ValueError, match="categorical"):
            MultiTripletNetwork(CFG, train_ds, target_variables=["age"])

    def test_triplet_loss_in_terms(self, datasets):
        import jax

        train_ds, _ = datasets
        model = MultiTripletNetwork(CFG, train_ds, target_variables=["subtype"])
        model.init_params(train_ds)
        batch = model.make_batch(train_ds, np.arange(16))
        total, (losses, _) = model.loss_fn(
            model.params, model.batch_stats, batch, jax.random.key(1), True
        )
        assert "triplet_loss" in losses and np.isfinite(float(total))


def _make_nw(train_ds, n_edges=300, seed=0):
    rng = np.random.default_rng(seed)
    genes = list(train_ds.features["gex"]) + list(train_ds.features["cnv"])
    a = rng.choice(genes, n_edges)
    b = rng.choice(genes, n_edges)
    df = pd.DataFrame({"protein1": a, "protein2": b, "score": rng.random(n_edges)})
    return MultiOmicDatasetNW(train_ds, df)


class TestGNN:
    @pytest.mark.parametrize("conv", ["GC", "GCN", "SAGE", "GAT"])
    def test_conv_types_train(self, datasets, conv):
        train_ds, test_ds = datasets
        nw_train = _make_nw(train_ds)
        cfg = dict(CFG, node_embedding_dim=4, num_convs=2, activation="relu")
        model = GNN(cfg, nw_train, target_variables=["subtype"],
                    gnn_conv_type=conv)
        res = _train(model, nw_train, epochs=20)
        assert np.isfinite(res.val_loss)
        nw_test = _make_nw(test_ds)
        preds = model.predict(nw_test)
        assert preds["subtype"].shape[0] == len(test_ds)

    def test_gnn_importance_per_layer(self, datasets):
        train_ds, _ = datasets
        nw = _make_nw(train_ds)
        cfg = dict(CFG, node_embedding_dim=4, num_convs=1, activation="relu")
        model = GNN(cfg, nw, target_variables=["subtype"])
        _train(model, nw, epochs=5)
        df = model.compute_feature_importance(nw, "subtype", steps_or_samples=4)
        assert set(df["layer"]) == {"gex", "cnv"}
        per_layer = df.groupby("layer")["name"].count()
        assert (per_layer == len(nw.node_names) * model.output_dims["subtype"]).all()


class TestGNNReadout:
    def test_mean_pool_readout(self, datasets):
        train_ds, _ = datasets
        nw = _make_nw(train_ds)
        cfg = dict(CFG, node_embedding_dim=4, num_convs=1,
                   activation="relu", gnn_readout="mean")
        model = GNN(cfg, nw, target_variables=["subtype"])
        res = _train(model, nw, epochs=10)
        assert np.isfinite(res.val_loss)
        # pooled head: fc fan-in is the embedding dim, not nodes * dim
        fc = model.params["encoder"]["fc"]["kernel"]
        assert fc.shape[0] == 4


class TestGraphOperators:
    def test_gcn_normalization_hand_computed(self):
        """3-node path graph a->b->c: check D^-1/2 (A+I) D^-1/2 entries."""
        from flexynesis_tpu.ops.graph_conv import build_operator

        edges = np.array([[0, 1], [1, 2]])  # src, dst columns
        A = build_operator(edges.T, 3, "GCN")
        # adjacency with self loops: row sums (degrees) = [1, 2, 2] for
        # in-edges at targets: A[1,0]=1, A[2,1]=1 plus identity
        deg = np.array([1.0, 2.0, 2.0])
        expected = np.zeros((3, 3))
        for i in range(3):
            expected[i, i] = 1.0 / deg[i]
        expected[1, 0] = 1.0 / np.sqrt(deg[1] * deg[0])
        expected[2, 1] = 1.0 / np.sqrt(deg[2] * deg[1])
        np.testing.assert_allclose(A, expected, rtol=1e-6)

    def test_sage_row_normalized(self):
        from flexynesis_tpu.ops.graph_conv import build_operator

        edges = np.array([[0, 2], [1, 2]]).T  # two edges into node 2
        A = build_operator(edges, 3, "SAGE")
        np.testing.assert_allclose(A[2], [0.5, 0.5, 0.0])
        # nodes without in-edges aggregate nothing
        np.testing.assert_allclose(A[0], 0.0)

    def test_gc_raw_adjacency(self):
        from flexynesis_tpu.ops.graph_conv import build_operator

        edges = np.array([[0, 1]]).T
        A = build_operator(edges, 2, "GC")
        np.testing.assert_allclose(A, [[0, 0], [1, 0]])

    def test_gat_adds_self_loops(self):
        """GAT operator must include self-loops (torch_geometric GATConv
        default add_self_loops=True): an isolated node attends to itself."""
        from flexynesis_tpu.ops.graph_conv import build_operator

        edges = np.array([[0, 1]]).T  # node 2 isolated
        A = build_operator(edges, 3, "GAT")
        np.testing.assert_allclose(np.diag(A), 1.0)
        assert A[1, 0] == 1.0

    def test_gat_isolated_node_output_is_self_term_not_bias(self):
        """With self-loops, an in-edge-free node's GAT output is its own
        transformed features + bias, not bias alone."""
        import jax

        from flexynesis_tpu.ops.graph_conv import DenseGraphConvLayer, build_operator

        edges = np.array([[0, 1]]).T
        A = jnp_arr = build_operator(edges, 3, "GAT")
        layer = DenseGraphConvLayer(out_dim=4, conv_type="GAT")
        x = np.random.default_rng(0).normal(size=(1, 3, 5)).astype(np.float32)
        params = layer.init(jax.random.key(0), x, jnp_arr)
        out = layer.apply(params, x, A)
        # node 2 attends only to itself: output == W x_2 + bias
        w = params["params"]["lin"]["kernel"]
        b = params["params"]["bias"]
        np.testing.assert_allclose(
            np.asarray(out[0, 2]), np.asarray(x[0, 2] @ w + b), rtol=1e-5
        )
