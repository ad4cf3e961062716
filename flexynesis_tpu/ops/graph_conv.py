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

A segment-sum path can replace the dense operator for very large graphs;
the dense form is the fast path for every benchmark dataset.
"""

from __future__ import annotations

import flax.linen as nn
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


class DenseGraphConvLayer(nn.Module):
    """One conv step: aggregate via the dense operator, then linear maps.

    GCN:      X' = (A_op X) W + b
    SAGE/GC:  X' = X W_root + (A_op X) W_nbr + b
    GAT:      X' = softmax-masked attention aggregation, single head
    """

    out_dim: int
    conv_type: str

    @nn.compact
    def __call__(self, x: jnp.ndarray, adj: jnp.ndarray) -> jnp.ndarray:
        fan_in = x.shape[-1]
        if self.conv_type == "GCN":
            agg = jnp.einsum(
                "nm,bmf->bnf", adj, x, preferred_element_type=jnp.float32
            )
            return nn.Dense(
                self.out_dim,
                kernel_init=xavier_uniform,
                bias_init=nn.initializers.zeros,
                name="lin",
            )(agg)
        if self.conv_type == "GAT":
            h = nn.Dense(
                self.out_dim, use_bias=False, kernel_init=xavier_uniform, name="lin"
            )(x)
            a_src = nn.Dense(1, use_bias=False, kernel_init=xavier_uniform,
                             name="att_src")(h)[..., 0]
            a_dst = nn.Dense(1, use_bias=False, kernel_init=xavier_uniform,
                             name="att_dst")(h)[..., 0]
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
            bias = self.param("bias", nn.initializers.zeros, (self.out_dim,))
            return out + bias
        # SAGE / GC: root weight + aggregated neighbors
        agg = jnp.einsum("nm,bmf->bnf", adj, x, preferred_element_type=jnp.float32)
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
