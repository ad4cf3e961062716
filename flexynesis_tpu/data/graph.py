"""Gene-interaction graph ingestion: STRING-DB + user-provided networks.

Capability parity with /root/reference/flexynesis/data.py:
* ``STRING`` (:1324-1424) — cached download of STRING v12.0 protein links +
  aliases for an organism, filtered to combined_score > 400 and the top-5
  strongest neighbors per protein, nodes mapped to gene names or Ensembl
  gene ids; per-user cache dir honoring ``FLEXYNESIS_CACHE`` and guarded by
  a FileLock so concurrent jobs don't corrupt downloads (:1307-1321, :1373).
* ``read_user_graph`` (:1427-1646) — custom GeneA/GeneB/Score tables with
  separator sniffing and fuzzy column matching (exact > substring >
  fuzzy-ratio > positional heuristics, acceptance threshold 30).
"""

from __future__ import annotations

import csv
import gzip
import os
import tempfile
from difflib import SequenceMatcher
from typing import Optional

import pandas as pd


def get_cache_dir() -> str:
    env = os.environ.get("FLEXYNESIS_CACHE")
    if env:
        return env
    try:
        from platformdirs import user_cache_dir

        return user_cache_dir("flexynesis_tpu")
    except Exception:
        return os.path.join(tempfile.gettempdir(), "flexynesis_tpu_cache")


class STRING:
    """STRING v12.0 links/aliases loader with on-disk caching."""

    BASE_LINKS = (
        "https://stringdb-downloads.org/download/protein.links.v12.0/"
        "{organism}.protein.links.v12.0.txt.gz"
    )
    BASE_ALIASES = (
        "https://stringdb-downloads.org/download/protein.aliases.v12.0/"
        "{organism}.protein.aliases.v12.0.txt.gz"
    )

    def __init__(
        self,
        root: Optional[str] = None,
        organism: int = 9606,
        node_name: str = "gene_name",
        score_threshold: int = 400,
        top_k: int = 5,
    ):
        self.root = root or get_cache_dir()
        self.organism = organism
        self.node_name = node_name
        self.score_threshold = score_threshold
        self.top_k = top_k
        os.makedirs(self.root, exist_ok=True)
        self.graph_df = self._load()

    # ------------------------------------------------------------ internals

    def _fetch(self, url: str, dest: str) -> str:
        if os.path.exists(dest):
            return dest
        from filelock import FileLock

        with FileLock(dest + ".lock"):
            if os.path.exists(dest):
                return dest
            print(f"[INFO] Downloading {url}")
            import requests

            r = requests.get(url, stream=True, timeout=300)
            r.raise_for_status()
            tmp = dest + ".part"
            with open(tmp, "wb") as fh:
                for chunk in r.iter_content(1 << 20):
                    fh.write(chunk)
            os.replace(tmp, dest)
        return dest

    def _load(self) -> pd.DataFrame:
        cache = os.path.join(
            self.root,
            f"string_{self.organism}_{self.node_name}_{self.score_threshold}"
            f"_{self.top_k}.parquet",
        )
        if os.path.exists(cache):
            return pd.read_parquet(cache)

        links_gz = self._fetch(
            self.BASE_LINKS.format(organism=self.organism),
            os.path.join(self.root, f"{self.organism}.links.txt.gz"),
        )
        alias_gz = self._fetch(
            self.BASE_ALIASES.format(organism=self.organism),
            os.path.join(self.root, f"{self.organism}.aliases.txt.gz"),
        )
        links = read_stringdb_links(
            links_gz, self.score_threshold, self.top_k
        )
        if self.node_name != "protein_id":
            alias = read_stringdb_aliases(alias_gz, self.node_name)
            links["protein1"] = links["protein1"].map(alias)
            links["protein2"] = links["protein2"].map(alias)
            links = links.dropna(subset=["protein1", "protein2"])
        try:
            links.to_parquet(cache)
        except Exception:
            pass
        return links


def read_stringdb_links(
    path: str, score_threshold: int = 400, top_k: int = 5
) -> pd.DataFrame:
    """Parse protein.links: filter by combined_score, keep top-k per protein."""
    df = pd.read_csv(path, sep=" ")
    df.columns = ["protein1", "protein2", "combined_score"]
    df = df[df["combined_score"] > score_threshold]
    df = (
        df.sort_values("combined_score", ascending=False)
        .groupby("protein1", sort=False)
        .head(top_k)
        .reset_index(drop=True)
    )
    return df


def read_stringdb_aliases(path: str, node_name: str = "gene_name") -> dict:
    """protein id -> gene symbol (or Ensembl gene id) from the aliases file."""
    source = (
        "Ensembl_HGNC_symbol" if node_name == "gene_name" else "Ensembl_gene"
    )
    mapping = {}
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as fh:
        next(fh)
        for line in fh:
            pid, alias, src = line.rstrip("\n").split("\t")[:3]
            if source in src and pid not in mapping:
                mapping[pid] = alias
    return mapping


# ------------------------------------------------------------- user graphs


def _sniff_sep(path: str) -> str:
    with open(path) as fh:
        sample = fh.read(8192)
    try:
        return csv.Sniffer().sniff(sample, delimiters=",;\t| ").delimiter
    except csv.Error:
        return ","


def _score_column(col: str, df: pd.DataFrame, role: str, position: int) -> float:
    """Heuristic score for how well a column fits a role (geneA/geneB/score)."""
    name = str(col).lower()
    targets = {
        "genea": ["genea", "gene_a", "gene1", "protein1", "source", "from", "node1"],
        "geneb": ["geneb", "gene_b", "gene2", "protein2", "target", "to", "node2"],
        "score": ["score", "weight", "combined_score", "confidence", "corr"],
    }[role]
    s = 0.0
    if name in targets:
        s += 100
    elif any(t in name for t in targets):
        s += 60
    else:
        s += 40 * max(SequenceMatcher(None, name, t).ratio() for t in targets)
    expected_pos = {"genea": 0, "geneb": 1, "score": 2}[role]
    if position == expected_pos:
        s += 15
    is_numeric = pd.api.types.is_numeric_dtype(df[col])
    if role == "score":
        s += 20 if is_numeric else -30
    else:
        s += 10 if not is_numeric else -20
    return s


def read_user_graph(
    path: str,
    sep: Optional[str] = None,
    gene_a: Optional[str] = None,
    gene_b: Optional[str] = None,
    score_col: Optional[str] = None,
    accept_threshold: float = 30.0,
) -> pd.DataFrame:
    """Read a GeneA/GeneB[/Score] network with fuzzy column detection.

    Returns a DataFrame with columns protein1 / protein2 / weight.
    """
    sep = sep or _sniff_sep(path)
    df = pd.read_csv(path, sep=sep)
    if df.shape[1] < 2:
        raise ValueError(
            f"User graph file needs >=2 columns (GeneA, GeneB[, Score]); "
            f"got {df.shape[1]} with separator '{sep}'"
        )

    cols = list(df.columns)
    picked = {}
    for role, override in (
        ("genea", gene_a),
        ("geneb", gene_b),
        ("score", score_col),
    ):
        if override is not None:
            picked[role] = override
            continue
        scores = {
            c: _score_column(c, df, role, cols.index(c))
            for c in cols
            if c not in picked.values()
        }
        if not scores:
            continue  # e.g. 2-column files have no score candidate left
        best_col, best_score = max(scores.items(), key=lambda kv: kv[1])
        if best_score >= accept_threshold:
            picked[role] = best_col

    if "genea" not in picked or "geneb" not in picked:
        raise ValueError("Could not identify GeneA/GeneB columns in user graph.")
    out = pd.DataFrame(
        {
            "protein1": df[picked["genea"]].astype(str),
            "protein2": df[picked["geneb"]].astype(str),
        }
    )
    if "score" in picked:
        out["weight"] = pd.to_numeric(df[picked["score"]], errors="coerce")
    else:
        out["weight"] = 1.0
    out = out.dropna()
    print(
        f"[INFO] User graph: {len(out)} edges "
        f"(columns: {picked.get('genea')}, {picked.get('geneb')}, "
        f"{picked.get('score', '<none>')})"
    )
    return out
