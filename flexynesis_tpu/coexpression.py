"""Co-expression network generator CLI.

Capability parity with /root/reference/flexynesis/generate_coexpression_network.py:
builds a gene-gene co-expression graph from a features-as-rows expression
matrix via Spearman or Pearson correlation, keeps edges with |r| above a
threshold plus the top-k strongest partners per gene, deduplicates, and
writes a GeneA/GeneB/Score CSV usable as ``--user_graph``.

TPU-first: the whole correlation matrix is one (G, G) Gram matmul on device
(genes standardized, Spearman = Pearson on ranks), tiled in row blocks so
arbitrarily many genes stream through fixed-size MXU GEMMs.

Usage: python -m flexynesis_tpu.coexpression --input gex.csv --output net.csv
"""

from __future__ import annotations

import argparse
import time

import numpy as np
import pandas as pd


def _rank_rows(X: np.ndarray) -> np.ndarray:
    """Average-rank transform per row (Spearman prep)."""
    from scipy.stats import rankdata

    return np.apply_along_axis(rankdata, 1, X)


def build_network(
    expr: pd.DataFrame,
    method: str = "spearman",
    correlation_threshold: float = 0.5,
    top_k: int = 5,
    block_size: int = 2048,
) -> pd.DataFrame:
    """Edge list (GeneA, GeneB, Score) from a genes x samples matrix."""
    import jax
    import jax.numpy as jnp

    genes = list(expr.index)
    X = expr.to_numpy(dtype=np.float32)
    if method == "spearman":
        X = _rank_rows(X).astype(np.float32)
    elif method != "pearson":
        raise ValueError("method must be 'spearman' or 'pearson'")

    # standardize rows -> correlation == dot / n
    X = X - X.mean(axis=1, keepdims=True)
    norm = np.linalg.norm(X, axis=1, keepdims=True)
    norm[norm == 0] = 1.0
    X = X / norm
    G = len(genes)
    Xd = jnp.asarray(X)

    # full matrix passed as an ARGUMENT, not closed over: closures become
    # HLO constants, and a large gene matrix inlined into the program
    # blows past the remote-compile tunnel's request cap (HTTP 413)
    @jax.jit
    def block_corr_topk(rows, full):
        corr = jnp.dot(rows, full.T, preferred_element_type=jnp.float32)
        acorr = jnp.abs(corr)
        vals, idx = jax.lax.top_k(acorr, top_k + 1)  # includes self
        return corr, vals, idx

    edges = {}
    t0 = time.perf_counter()
    for start in range(0, G, block_size):
        stop = min(start + block_size, G)
        rows = Xd[start:stop]
        if rows.shape[0] < block_size and G > block_size:
            rows = jnp.pad(rows, ((0, block_size - rows.shape[0]), (0, 0)))
        corr, vals, idx = block_corr_topk(rows, Xd)
        corr = np.asarray(corr)[: stop - start]
        idx = np.asarray(idx)[: stop - start]
        for bi in range(stop - start):
            gi = start + bi
            for j in idx[bi]:
                j = int(j)
                if j == gi:
                    continue
                r = float(corr[bi, j])
                if abs(r) < correlation_threshold:
                    continue
                key = (gi, j) if gi < j else (j, gi)
                if key not in edges or abs(edges[key]) < abs(r):
                    edges[key] = r
        # threshold edges beyond top-k: also capture all |r| >= threshold
        strong = np.argwhere(np.abs(corr) >= correlation_threshold)
        for bi, j in strong:
            gi = start + int(bi)
            j = int(j)
            if j == gi:
                continue
            key = (gi, j) if gi < j else (j, gi)
            edges.setdefault(key, float(corr[bi, j]))
    print(
        f"[INFO] Correlation sweep over {G} genes took "
        f"{time.perf_counter() - t0:.2f}s; {len(edges)} edges"
    )
    rows = [
        {"GeneA": genes[a], "GeneB": genes[b], "Score": score}
        for (a, b), score in edges.items()
    ]
    return pd.DataFrame(rows, columns=["GeneA", "GeneB", "Score"])


def generate_coexpression_network(
    input_csv: str,
    output_csv: str,
    method: str = "spearman",
    correlation_threshold: float = 0.5,
    top_k: int = 5,
    max_genes: int = 0,
) -> pd.DataFrame:
    expr = pd.read_csv(input_csv, index_col=0)
    if max_genes and len(expr) > max_genes:
        variances = expr.var(axis=1)
        expr = expr.loc[variances.sort_values(ascending=False).index[:max_genes]]
        print(f"[INFO] Restricted to top {max_genes} most-variable genes")
    net = build_network(
        expr, method=method,
        correlation_threshold=correlation_threshold, top_k=top_k,
    )
    net.to_csv(output_csv, index=False)
    print(f"[INFO] Wrote {len(net)} edges to {output_csv}")
    return net


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Generate a co-expression network usable as --user_graph"
    )
    ap.add_argument("--input", required=True, help="Expression CSV (genes x samples)")
    ap.add_argument("--output", required=True, help="Output edge-list CSV")
    ap.add_argument("--method", choices=["spearman", "pearson"],
                    default="spearman")
    ap.add_argument("--correlation_threshold", type=float, default=0.5)
    ap.add_argument("--top_k", type=int, default=5)
    ap.add_argument("--max_genes", type=int, default=0,
                    help="Restrict to N most-variable genes (0 = all)")
    args = ap.parse_args(argv)
    generate_coexpression_network(
        args.input, args.output, args.method,
        args.correlation_threshold, args.top_k, args.max_genes,
    )


if __name__ == "__main__":
    main()
