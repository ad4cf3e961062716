"""Dense vs sparse graph-conv parity (ops/graph_conv.py).

The sparse edge-list operator (build_sparse_operator + segment_sum
aggregation) must compute EXACTLY the same math as the dense (N, N)
operator for every conv type — forward and gradients — including the
corner cases the STRING importer produces: duplicate edges, isolated
nodes, hub nodes. Reference semantics: torch_geometric GCNConv/SAGEConv/
GraphConv/GATConv (reference modules.py:153-262).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flexynesis_tpu.ops.graph_conv import (
    SPARSE_NODE_THRESHOLD,
    DenseGraphConvLayer,
    FlexGCN,
    build_operator,
    build_sparse_operator,
)

CONV_TYPES = ["GCN", "SAGE", "GC", "GAT"]


def random_graph(n_nodes=50, n_edges=200, seed=0, with_dupes=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_nodes, n_edges)
    dst = rng.integers(0, n_nodes, n_edges)
    # guarantee an isolated node (no in- or out-edges) and a duplicate edge
    src = np.where(src == n_nodes - 1, 0, src)
    dst = np.where(dst == n_nodes - 1, 0, dst)
    if with_dupes:
        src = np.concatenate([src, src[:5]])
        dst = np.concatenate([dst, dst[:5]])
    return np.stack([src, dst])


class TestSparseOperatorParity:
    @pytest.mark.parametrize("conv_type", ["GCN", "SAGE", "GC"])
    def test_weights_reconstruct_dense_operator(self, conv_type):
        n = 50
        ei = random_graph(n_nodes=n)
        dense = build_operator(ei, n, conv_type)
        sp = build_sparse_operator(ei, n, conv_type, pad_multiple=64)
        recon = np.zeros((n, n), dtype=np.float32)
        recon[sp["dst"], sp["src"]] += sp["w"]
        np.testing.assert_allclose(recon, dense, atol=1e-6)

    def test_gat_edge_set_matches_dense_mask(self):
        n = 50
        ei = random_graph(n_nodes=n)
        dense = build_operator(ei, n, "GAT")
        sp = build_sparse_operator(ei, n, "GAT", pad_multiple=64)
        recon = np.zeros((n, n), dtype=np.float32)
        recon[sp["dst"], sp["src"]] = np.where(sp["w"] > 0, 1.0, recon[sp["dst"], sp["src"]])
        np.testing.assert_array_equal(recon > 0, dense > 0)

    def test_padding_is_inert_and_sorted(self):
        n = 30
        ei = random_graph(n_nodes=n, n_edges=40)
        sp = build_sparse_operator(ei, n, "GC", pad_multiple=512)
        assert len(sp["src"]) == 512
        # dst stays sorted through the padding (segment_sum fast path)
        assert np.all(np.diff(sp["dst"]) >= 0)
        assert np.all(sp["w"][np.count_nonzero(sp["w"]):] == 0)

    def test_duplicate_edges_collapse_like_dense(self):
        n = 10
        ei = np.array([[0, 0, 0, 1], [1, 1, 1, 2]])  # 0->1 three times
        dense = build_operator(ei, n, "GC")
        sp = build_sparse_operator(ei, n, "GC", pad_multiple=16)
        recon = np.zeros((n, n), dtype=np.float32)
        recon[sp["dst"], sp["src"]] += sp["w"]
        np.testing.assert_allclose(recon, dense)


class TestLayerParity:
    def _setup(self, conv_type, n=50, b=4, f=8, out=16, seed=3):
        ei = random_graph(n_nodes=n, seed=seed)
        dense = jnp.asarray(build_operator(ei, n, conv_type))
        sparse = jax.tree.map(
            jnp.asarray, build_sparse_operator(ei, n, conv_type, pad_multiple=64)
        )
        layer = DenseGraphConvLayer(out_dim=out, conv_type=conv_type)
        x = jax.random.normal(jax.random.key(seed), (b, n, f))
        params = layer.init(jax.random.key(seed + 1), x, dense)
        return layer, params, x, dense, sparse

    @pytest.mark.parametrize("conv_type", CONV_TYPES)
    def test_forward_parity(self, conv_type):
        layer, params, x, dense, sparse = self._setup(conv_type)
        y_dense = layer.apply(params, x, dense)
        y_sparse = layer.apply(params, x, sparse)
        np.testing.assert_allclose(
            np.asarray(y_dense), np.asarray(y_sparse), atol=2e-5, rtol=2e-5
        )

    @pytest.mark.parametrize("conv_type", CONV_TYPES)
    def test_grad_parity(self, conv_type):
        layer, params, x, dense, sparse = self._setup(conv_type)

        def loss(p, adj):
            return jnp.sum(jnp.square(layer.apply(p, x, adj)))

        g_dense = jax.grad(loss)(params, dense)
        g_sparse = jax.grad(loss)(params, sparse)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=5e-4
            ),
            g_dense, g_sparse,
        )

    @pytest.mark.parametrize("conv_type", CONV_TYPES)
    def test_flexgcn_eval_parity(self, conv_type):
        n, b, f = 40, 3, 4
        ei = random_graph(n_nodes=n, seed=9)
        dense = jnp.asarray(build_operator(ei, n, conv_type))
        sparse = jax.tree.map(
            jnp.asarray, build_sparse_operator(ei, n, conv_type, pad_multiple=64)
        )
        net = FlexGCN(
            n_nodes=n, node_embedding_dim=8, output_dim=6,
            num_convs=2, conv_type=conv_type,
        )
        x = jax.random.normal(jax.random.key(1), (b, n, f))
        variables = net.init(jax.random.key(2), x, dense, train=False)
        y_dense = net.apply(variables, x, dense, train=False)
        y_sparse = net.apply(variables, x, sparse, train=False)
        np.testing.assert_allclose(
            np.asarray(y_dense), np.asarray(y_sparse), atol=2e-5, rtol=2e-5
        )

    def test_vmap_over_trials_composes(self):
        # the trial engine vmaps the model over stacked params with the
        # adjacency broadcast whole — the sparse dict must ride through
        conv_type = "GC"
        layer, params, x, dense, sparse = self._setup(conv_type)
        stacked = jax.tree.map(lambda a: jnp.stack([a, a * 1.5]), params)
        y = jax.vmap(lambda p: layer.apply(p, x, sparse))(stacked)
        y0 = layer.apply(params, x, dense)
        np.testing.assert_allclose(
            np.asarray(y[0]), np.asarray(y0), atol=2e-5, rtol=2e-5
        )


class TestModelSelection:
    def test_auto_threshold(self):
        from flexynesis_tpu.models.gnn import GNN

        class FakeNW:
            pass

        # below threshold -> dense array; forced sparse -> dict
        ei = random_graph(n_nodes=20, n_edges=40)

        def make(cfg_extra, n_nodes):
            ds = _tiny_nw_dataset(n_nodes=n_nodes, edge_index=ei)
            cfg = {"latent_dim": 4, "node_embedding_dim": 4, "num_convs": 1,
                   "supervisor_hidden_dim": 4, "lr": 1e-3, "epochs": 1,
                   "batch_size": 4, **cfg_extra}
            return GNN(cfg, ds, target_variables=["subtype"])

        m_dense = make({}, 20)
        assert not isinstance(m_dense._adj, dict)
        m_sparse = make({"gnn_sparse": True}, 20)
        assert isinstance(m_sparse._adj, dict)
        assert 20 < SPARSE_NODE_THRESHOLD  # auto stays dense here

        # string passthroughs from YAML/CLI configs are normalized, not
        # truthiness-selected: "false" must select DENSE, and anything
        # unrecognized is rejected (advisor round-4 finding, gnn.py)
        assert not isinstance(make({"gnn_sparse": "false"}, 20)._adj, dict)
        assert isinstance(make({"gnn_sparse": "True"}, 20)._adj, dict)
        assert not isinstance(make({"gnn_sparse": "AUTO"}, 20)._adj, dict)
        import pytest

        with pytest.raises(ValueError, match="gnn_sparse"):
            make({"gnn_sparse": "yes"}, 20)
        with pytest.raises(ValueError, match="gnn_sparse"):
            make({"gnn_sparse": 1}, 20)

    def test_sparse_model_trains_and_matches_dense_eval(self):
        from flexynesis_tpu.models.gnn import GNN

        ei = random_graph(n_nodes=20, n_edges=60, seed=4)
        ds = _tiny_nw_dataset(n_nodes=20, edge_index=ei)
        cfg = {"latent_dim": 4, "node_embedding_dim": 4, "num_convs": 1,
               "supervisor_hidden_dim": 4, "lr": 1e-3, "epochs": 2,
               "batch_size": 4}
        dense_m = GNN(cfg, ds, target_variables=["subtype"])
        sparse_m = GNN({**cfg, "gnn_sparse": True}, ds,
                       target_variables=["subtype"])
        dense_m.init_params(ds, seed=7)
        sparse_m.init_params(ds, seed=7)
        xb = dense_m.make_batch(ds)
        out_d, _ = dense_m._apply(
            dense_m.params, dense_m.batch_stats,
            {"all": xb["x"]["all"]}, jax.random.key(0), False,
            xb["_adj"],
        )
        xs = sparse_m.make_batch(ds)
        out_s, _ = sparse_m._apply(
            sparse_m.params, sparse_m.batch_stats,
            {"all": xs["x"]["all"]}, jax.random.key(0), False,
            xs["_adj"],
        )
        np.testing.assert_allclose(
            np.asarray(out_d["embeddings"]), np.asarray(out_s["embeddings"]),
            atol=2e-5, rtol=2e-5,
        )


def _tiny_nw_dataset(n_nodes, edge_index, n_samples=8):
    """Minimal MultiOmicDatasetNW for GNN construction."""
    import pandas as pd

    from flexynesis_tpu.data.dataset import MultiOmicDataset, MultiOmicDatasetNW

    rng = np.random.default_rng(0)
    feats = [f"g{i}" for i in range(n_nodes)]
    dat = {"gex": rng.normal(size=(n_samples, n_nodes)).astype(np.float32)}
    ann = {"subtype": rng.integers(0, 2, n_samples).astype(np.float32)}
    base = MultiOmicDataset(
        dat=dat, ann=ann,
        variable_types={"subtype": "categorical"},
        features={"gex": feats},
        samples=[f"S{i}" for i in range(n_samples)],
        label_mappings={"subtype": {0: "a", 1: "b"}},
    )
    interactions = pd.DataFrame({
        "protein1": [feats[s] for s in np.asarray(edge_index[0])],
        "protein2": [feats[d] for d in np.asarray(edge_index[1])],
    })
    return MultiOmicDatasetNW(base, interactions)
