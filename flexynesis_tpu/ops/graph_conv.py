"""Graph convolutions, TPU-first.

Capability parity with the reference's flexGCN (modules.py:153-262), which
wraps torch_geometric's GCNConv / SAGEConv / GraphConv / GATConv sparse
message passing. On TPU, scatter-based message passing maps poorly to the
MXU; gene-interaction graphs here are small (10^2..10^4 nodes), so
aggregation is reformulated as ONE dense operator matmul:

    X' = A_op @ X           (batched: einsum('nm,bmf->bnf'))

with ``A_op`` precomputed on host per conv type:
* GCN  — D^-1/2 (A + I) D^-1/2  (torch_geometric GCNConv normalization)
* SAGE — row-normalized A (mean aggregation) + root weight
* GC   — raw A (sum aggregation)   + root weight   (GraphConv)
* GAT  — attention coefficients computed densely over the masked adjacency

For STRING-scale graphs (5-15k nodes at <1% density) the dense operator
does 100-1000x the useful work and its N^2 storage starts to matter, so a
SPARSE path exists: ``build_sparse_operator`` emits a padded, dst-sorted
edge list and the conv layer aggregates with ``jax.ops.segment_sum``
(sorted segment ids lower to an efficient TPU reduce, not a random
scatter). Both paths share the layer code and are parity-tested against
each other (tests/test_gnn.py). Selection: GNN config ``gnn_sparse`` in
{"auto", True, False}; auto switches to sparse at SPARSE_NODE_THRESHOLD
nodes (measured crossover — tools/measure_gnn_scale.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .initializers import make_torch_bias_init, torch_linear_kernel_init, xavier_uniform
from .mlp import BN_EPS, BN_MOMENTUM

ACTIVATIONS = {
    "relu": nn.relu,
    "sigmoid": nn.sigmoid,
    "leakyrelu": lambda x: nn.leaky_relu(x, negative_slope=0.01),
    "tanh": jnp.tanh,
    "gelu": nn.gelu,
}


def build_operator(
    edge_index: np.ndarray, n_nodes: int, conv_type: str
) -> np.ndarray:
    """Dense aggregation operator from a (2, E) COO edge index.

    PyG convention: edge_index[0] = source, edge_index[1] = target;
    messages aggregate at the target node, so A[t, s] = 1.
    """
    A = np.zeros((n_nodes, n_nodes), dtype=np.float32)
    src, dst = np.asarray(edge_index[0]), np.asarray(edge_index[1])
    A[dst, src] = 1.0
    if conv_type == "GCN":
        A = A + np.eye(n_nodes, dtype=np.float32)
        d = A.sum(axis=1)
        dis = 1.0 / np.sqrt(np.where(d > 0, d, 1.0))
        return A * dis[:, None] * dis[None, :]
    if conv_type == "SAGE":
        deg = A.sum(axis=1, keepdims=True)
        return A / np.clip(deg, 1.0, None)
    if conv_type == "GC":
        return A
    if conv_type == "GAT":
        # torch_geometric GATConv defaults to add_self_loops=True: each
        # node's own transformed features join the attention softmax, so a
        # node with no in-edges still outputs its self term (not just bias).
        np.fill_diagonal(A, 1.0)
        return A
    raise ValueError(f"Unknown convolution type: {conv_type}")


# auto-switch to the edge-list operator at this node count. Measured on
# real TPU (tools/measure_gnn_scale.py, 2026-08-19, ring+2n random edges
# ~0.1% density, train samples/s): the dense MXU einsum WINS below the
# threshold — 2k: 4738 vs 4008 (1.18x), 4k: 1267 vs 1111 (1.14x), 6k:
# 1185 vs 1151 (parity) — and above it the dense operator stops being
# viable: the 8k dense program never finished compiling through the
# remote-compile tunnel (>1200s, killed) while sparse compiled in 20s
# and ran 939 samples/s; storage is n^2*4B (8k = 256 MB, 15k = 900 MB)
# vs ~12B/edge. Denser graphs shift the crossover up — override with
# config gnn_sparse: true/false.
SPARSE_NODE_THRESHOLD = 8192


def build_sparse_operator(
    edge_index: np.ndarray, n_nodes: int, conv_type: str,
    pad_multiple: int = 512,
) -> dict:
    """Edge-list aggregation operator: the sparse analog of
    ``build_operator`` with IDENTICAL math per conv type.

    Returns ``{"src": int32 (Ep,), "dst": int32 (Ep,), "w": float32 (Ep,)}``
    sorted by ``dst`` (so ``segment_sum(indices_are_sorted=True)`` lowers
    to a sorted reduce on TPU) and zero-padded to a multiple of
    ``pad_multiple`` (static shapes across graphs of similar size hit the
    jit cache; padded edges carry w=0 so they add nothing — for GAT, w=0
    doubles as the softmax mask). Duplicate edges collapse exactly like
    the dense builder's ``A[dst, src] = 1``. For GCN/GAT, self-loops are
    added (torch_geometric default, same as the dense path).
    """
    src = np.asarray(edge_index[0], dtype=np.int64)
    dst = np.asarray(edge_index[1], dtype=np.int64)
    keys = np.unique(dst * n_nodes + src)  # dedup + sort by (dst, src)
    loops = np.arange(n_nodes, dtype=np.int64) * (n_nodes + 1)
    if conv_type == "GCN":
        # dense builder does A + I, which DOUBLES an explicit self-edge
        # (A[i,i]=1 becomes 2) — counts reproduce that exactly
        keys, counts = np.unique(
            np.concatenate([keys, loops]), return_counts=True
        )
        dst, src = keys // n_nodes, keys % n_nodes
        deg = np.bincount(
            dst, weights=counts.astype(np.float64), minlength=n_nodes
        ).astype(np.float32)
        dis = 1.0 / np.sqrt(np.where(deg > 0, deg, 1.0))
        w = counts.astype(np.float32) * dis[dst] * dis[src]
    else:
        if conv_type == "GAT":
            # dense fill_diagonal SETS 1 (no doubling): plain union
            keys = np.unique(np.concatenate([keys, loops]))
        dst, src = keys // n_nodes, keys % n_nodes
        deg = np.bincount(dst, minlength=n_nodes).astype(np.float32)
        if conv_type == "SAGE":
            w = 1.0 / np.clip(deg, 1.0, None)[dst]
        elif conv_type in ("GC", "GAT"):
            w = np.ones(len(dst), dtype=np.float32)
        else:
            raise ValueError(f"Unknown convolution type: {conv_type}")
    e = len(dst)
    ep = max(pad_multiple, -(-e // pad_multiple) * pad_multiple)
    out = {
        # padded edges point at the LAST node (keeps dst sorted for the
        # segment_sum fast path) with w=0, so they contribute nothing
        "src": np.zeros(ep, dtype=np.int32),
        "dst": np.full(ep, n_nodes - 1, dtype=np.int32),
        "w": np.zeros(ep, dtype=np.float32),
    }
    out["src"][:e] = src
    out["dst"][:e] = dst
    out["w"][:e] = w
    return out


def _sparse_gat(h: jnp.ndarray, a_src: jnp.ndarray, a_dst: jnp.ndarray,
                adj: dict) -> jnp.ndarray:
    """Per-edge attention with a dst-segment softmax — the sparse analog
    of the dense masked softmax (identical semantics; padded edges are
    excluded via w == 0). h: (B, N, F); a_src/a_dst: (B, N)."""
    src, dst, w = adj["src"], adj["dst"], adj["w"]
    n = h.shape[1]
    scores = nn.leaky_relu(
        jnp.take(a_dst, dst, axis=1) + jnp.take(a_src, src, axis=1),
        negative_slope=0.2,
    )  # (B, E)
    valid = (w > 0)[None, :]
    neg = jnp.finfo(scores.dtype).min  # finite lowest: -inf - -inf = NaN
    scores = jnp.where(valid, scores, neg)
    smax = jax.ops.segment_max(
        scores.transpose(1, 0), dst,
        num_segments=n, indices_are_sorted=True,
    ).transpose(1, 0)  # (B, N)
    smax = jnp.where(smax > neg / 2, smax, 0.0)  # no-in-edge nodes
    expd = jnp.where(
        valid, jnp.exp(scores - jnp.take(smax, dst, axis=1)), 0.0
    )
    denom = jax.ops.segment_sum(
        expd.transpose(1, 0), dst,
        num_segments=n, indices_are_sorted=True,
    ).transpose(1, 0)  # (B, N)
    alpha = expd / jnp.maximum(jnp.take(denom, dst, axis=1), 1e-9)
    msgs = jnp.take(h, src, axis=1) * alpha[..., None]  # (B, E, F)
    return jax.ops.segment_sum(
        msgs.transpose(1, 0, 2), dst,
        num_segments=n, indices_are_sorted=True,
    ).transpose(1, 0, 2)


def _sparse_aggregate(x: jnp.ndarray, adj: dict) -> jnp.ndarray:
    """sum_{e: dst_e = n} w_e * x[:, src_e, :] via sorted segment_sum."""
    msgs = jnp.take(x, adj["src"], axis=1) * adj["w"][None, :, None]
    agg = jax.ops.segment_sum(
        msgs.transpose(1, 0, 2), adj["dst"],
        num_segments=x.shape[1], indices_are_sorted=True,
    )
    return agg.transpose(1, 0, 2)


class DenseGraphConvLayer(nn.Module):
    """One conv step: aggregate, then linear maps.

    GCN:      X' = (A_op X) W + b
    SAGE/GC:  X' = X W_root + (A_op X) W_nbr + b
    GAT:      X' = softmax-masked attention aggregation, single head

    ``adj`` is either the dense (N, N) operator (aggregation = one MXU
    einsum) or the ``build_sparse_operator`` edge dict (aggregation = a
    sorted segment_sum; GAT uses a per-edge segment softmax). Parameters
    and math are identical across the two forms.
    """

    out_dim: int
    conv_type: str

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj) -> jnp.ndarray:
        fan_in = x.shape[-1]
        sparse = isinstance(adj, dict)

        def aggregate(v):
            if sparse:
                return _sparse_aggregate(v, adj)
            return jnp.einsum(
                "nm,bmf->bnf", adj, v, preferred_element_type=jnp.float32
            )

        if self.conv_type == "GCN":
            return nn.Dense(
                self.out_dim,
                kernel_init=xavier_uniform,
                bias_init=nn.initializers.zeros,
                name="lin",
            )(aggregate(x))
        if self.conv_type == "GAT":
            h = nn.Dense(
                self.out_dim, use_bias=False, kernel_init=xavier_uniform, name="lin"
            )(x)
            a_src = nn.Dense(1, use_bias=False, kernel_init=xavier_uniform,
                             name="att_src")(h)[..., 0]
            a_dst = nn.Dense(1, use_bias=False, kernel_init=xavier_uniform,
                             name="att_dst")(h)[..., 0]
            bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
            if sparse:
                return _sparse_gat(h, a_src, a_dst, adj) + bias
            # scores[b, i, j] = leakyrelu(a_dst_i + a_src_j) on existing edges
            scores = nn.leaky_relu(
                a_dst[:, :, None] + a_src[:, None, :], negative_slope=0.2
            )
            mask = adj[None, :, :] > 0
            scores = jnp.where(mask, scores, -jnp.inf)
            # explicit masked softmax (rows with no neighbours -> all-zero)
            smax = jnp.max(scores, axis=-1, keepdims=True)
            smax = jnp.where(jnp.isfinite(smax), smax, 0.0)
            expd = jnp.where(mask, jnp.exp(scores - smax), 0.0)
            alpha = expd / jnp.maximum(
                jnp.sum(expd, axis=-1, keepdims=True), 1e-9
            )
            out = jnp.einsum(
                "bnm,bmf->bnf", alpha, h, preferred_element_type=jnp.float32
            )
            return out + bias
        # SAGE / GC: root weight + aggregated neighbors
        agg = aggregate(x)
        root = nn.Dense(
            self.out_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            name="lin_root",
        )(x)
        nbr = nn.Dense(
            self.out_dim,
            use_bias=False,
            kernel_init=torch_linear_kernel_init,
            name="lin_nbr",
        )(agg)
        return root + nbr


class FlexGCN(nn.Module):
    """N conv layers (BatchNorm + act + dropout each) -> flatten -> Dense.

    Reference modules.py:153-262: per-layer BatchNorm over flattened nodes,
    dropout 0.2, final FC aggregating all node embeddings to ``output_dim``.
    """

    n_nodes: int
    node_embedding_dim: int
    output_dim: int
    num_convs: int = 2
    conv_type: str = "GC"
    activation: str = "relu"
    dropout_rate: float = 0.2
    # 'flatten' reproduces the reference's all-nodes FC head
    # (modules.py:250); 'mean' pools nodes first — O(E) instead of
    # O(nodes * E) head parameters, the escape hatch for large graphs
    # (SURVEY.md §7.3 GNN-memory note)
    readout: str = "flatten"

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray, *, train: bool):
        act = ACTIVATIONS[self.activation]
        for i in range(self.num_convs):
            x = DenseGraphConvLayer(
                self.node_embedding_dim, self.conv_type, name=f"conv_{i}"
            )(x, adj)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                name=f"bn_{i}",
            )(x)
            x = act(x)
            x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        if self.readout == "mean":
            x = jnp.mean(x, axis=1)
            fan_in = self.node_embedding_dim
        else:
            x = x.reshape(x.shape[0], -1)
            fan_in = self.n_nodes * self.node_embedding_dim
        return nn.Dense(
            self.output_dim,
            kernel_init=torch_linear_kernel_init,
            bias_init=make_torch_bias_init(fan_in),
            name="fc",
        )(x)
