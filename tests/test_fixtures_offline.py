"""STRING and cBioPortal components exercised end-to-end with vendored
miniature fixtures (zero egress) — VERDICT r1 item 6.

The fixture files mimic the real formats: STRING v12 protein.links
(space-separated, combined_score) and protein.aliases (tab-separated with a
source column), and a cBioPortal datahub study tarball with #-commented
clinical headers and a long mutations table.
"""

import gzip
import os
import shutil

import numpy as np
import pandas as pd
import pytest

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures")


class TestStringOffline:
    @pytest.fixture()
    def cache(self, tmp_path):
        """A warm cache dir: the fixture files sit where _fetch would put
        downloads, so STRING() never touches the network."""
        shutil.copy(
            os.path.join(FIXTURES, "string", "9606.protein.links.v12.0.txt.gz"),
            tmp_path / "9606.links.txt.gz",
        )
        shutil.copy(
            os.path.join(FIXTURES, "string", "9606.protein.aliases.v12.0.txt.gz"),
            tmp_path / "9606.aliases.txt.gz",
        )
        return str(tmp_path)

    def test_read_links_filters_and_topk(self):
        from flexynesis_tpu.data.graph import read_stringdb_links

        path = os.path.join(
            FIXTURES, "string", "9606.protein.links.v12.0.txt.gz"
        )
        df = read_stringdb_links(path, score_threshold=400, top_k=5)
        # score <= 400 dropped (ENSP03-ENSP05 at 400, ENSP04-ENSP05 at 399,
        # ENSP05-ENSP06 at 250)
        assert (df["combined_score"] > 400).all()
        # ENSP01 has 7 partners above threshold -> capped at top-5 strongest
        p1 = df[df["protein1"] == "9606.ENSP01"]
        assert len(p1) == 5
        assert p1["combined_score"].min() == 700  # 650/600 cut

    def test_read_aliases_maps_symbols(self):
        from flexynesis_tpu.data.graph import read_stringdb_aliases

        path = os.path.join(
            FIXTURES, "string", "9606.protein.aliases.v12.0.txt.gz"
        )
        m = read_stringdb_aliases(path, "gene_name")
        assert m["9606.ENSP01"] == "TP53"
        assert m["9606.ENSP08"] == "ATM"  # substring source match
        assert "9606.ENSP09" not in m  # UniProt-only alias ignored
        # Ensembl gene ids via the other node_name
        g = read_stringdb_aliases(path, "gene_id")
        assert g["9606.ENSP01"] == "ENSG0001"

    def test_string_end_to_end_offline(self, cache):
        from flexynesis_tpu.data.graph import STRING

        s = STRING(root=cache, organism=9606, node_name="gene_name")
        df = s.graph_df
        assert set(df.columns) == {"protein1", "protein2", "combined_score"}
        # nodes are gene symbols now
        assert "TP53" in set(df["protein1"])
        # the ENSP07 -> ENSP09 edge (score 990) drops: ENSP09 has no symbol
        assert "RB1" not in set(df["protein1"])
        # the processed graph is parquet-cached for the next constructor call
        cached = [f for f in os.listdir(cache) if f.endswith(".parquet")]
        assert cached, "expected a parquet cache file"
        s2 = STRING(root=cache, organism=9606, node_name="gene_name")
        pd.testing.assert_frame_equal(s.graph_df, s2.graph_df)

    def test_string_graph_feeds_gnn_dataset(self, cache, rng):
        """The offline STRING graph must plug into MultiOmicDatasetNW."""
        from flexynesis_tpu.data.dataset import (
            MultiOmicDataset,
            MultiOmicDatasetNW,
        )
        from flexynesis_tpu.data.graph import STRING

        genes = ["TP53", "BRCA1", "EGFR", "MYC", "KRAS", "PTEN"]
        n = 12
        ds = MultiOmicDataset(
            dat={"mut": rng.normal(size=(n, len(genes))).astype(np.float32)},
            ann={"y": rng.integers(0, 2, n).astype(np.float32)},
            variable_types={"y": "categorical"},
            features={"mut": genes},
            samples=[f"P{i}" for i in range(n)],
            label_mappings={"y": {0: "a", 1: "b"}},
        )
        s = STRING(root=cache, organism=9606)
        nw = MultiOmicDatasetNW(ds, s.graph_df)
        assert set(nw.node_names) <= set(genes)
        assert nw.edge_index.shape[0] == 2 and nw.edge_index.shape[1] > 0


class TestCBioPortalOffline:
    @pytest.fixture()
    def portal(self, tmp_path):
        from flexynesis_tpu.utils.cbioportal import CBioPortalData

        cb = CBioPortalData("mini_study", cache_dir=str(tmp_path))
        # pre-place the archive where download_study_archive caches it ->
        # the download path short-circuits on the existing file
        shutil.copy(
            os.path.join(FIXTURES, "cbioportal", "mini_study.tar.gz"),
            tmp_path / "mini_study.tar.gz",
        )
        return cb

    def test_archive_parse_and_binarize(self, portal):
        dat = portal.get_cbioportal_data("mini_study")
        assert set(dat) == {"clin", "mut"}
        clin, mut = dat["clin"], dat["mut"]
        # '#' comment lines skipped, PATIENT_ID became the index
        assert list(clin.index) == ["S1", "S2", "S3", "S4", "S5", "S6"]
        assert clin.loc["S4", "SUBTYPE"] == "Basal"
        # binarized gene x sample: duplicate TP53/S1 records collapse to 1
        assert mut.loc["TP53", "S1"] == 1
        assert mut.loc["TP53", "S3"] == 0
        assert set(mut.values.ravel()) <= {0, 1}
        assert mut.shape == (5, 6)

    def test_split_and_write_importable_layout(self, portal, tmp_path):
        from flexynesis_tpu.data.importer import DataImporter

        portal.get_cbioportal_data("mini_study")
        split = portal.split_data(ratio=0.7)
        assert set(split) == {"train", "test"}
        assert split["train"]["mut"].shape[1] == 4  # 70% of 6
        outdir = str(tmp_path / "folders")
        portal.print_dataset(split, outdir)
        # the written layout is directly consumable by DataImporter
        imp = DataImporter(
            outdir, ["mut"], top_percentile=0, variance_threshold=0,
            na_threshold=1.0, min_features=2,
        )
        train_ds, test_ds = imp.import_data()
        assert len(train_ds) > 0 and len(test_ds) > 0
        assert "SUBTYPE" in train_ds.variable_types
