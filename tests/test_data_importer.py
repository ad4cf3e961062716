"""Data layer tests: importer pipeline semantics + Laplacian feature selection
vs a scipy/sklearn reimplementation of the reference math
(feature_selection.py:11-48)."""

import numpy as np
import pandas as pd
import pytest

from flexynesis_tpu.data.feature_selection import (
    filter_by_laplacian,
    laplacian_score,
)
from flexynesis_tpu.data.importer import DataImporter
from flexynesis_tpu.utils.synthetic import write_synthetic_folder


def reference_laplacian_score(X, k=5):
    from scipy.sparse import csgraph, diags
    from sklearn.neighbors import kneighbors_graph

    n = X.shape[0]
    W = kneighbors_graph(X, k, mode="connectivity", include_self=True)
    D_vec = np.array(W.sum(axis=1)).flatten()
    D_inv_sqrt = diags(1.0 / np.sqrt(D_vec))
    S = (D_inv_sqrt @ W @ D_inv_sqrt).toarray()
    L = csgraph.laplacian(W, normed=True)
    D = diags(D_vec)
    F = X - (S @ X).sum(axis=0) / n
    LF = np.asarray(L @ F)
    DF = np.asarray(D @ F)
    return (F * LF).sum(axis=0) / (F * DF).sum(axis=0)


class TestLaplacianScore:
    def test_matches_scipy_reference(self, rng):
        X = rng.normal(size=(50, 20)).astype(np.float32)
        ours = laplacian_score(X, k=5)
        theirs = reference_laplacian_score(X.astype(np.float64), k=5)
        np.testing.assert_allclose(ours, theirs, rtol=2e-3, atol=1e-4)

    def test_ranking_agreement(self, rng):
        # structured data: informative features should rank identically
        cls = rng.integers(0, 3, size=80)
        X = np.concatenate(
            [
                (cls[:, None] * 2 + rng.normal(0, 0.5, (80, 10))),
                rng.normal(0, 1.0, (80, 30)),
            ],
            axis=1,
        ).astype(np.float32)
        ours = laplacian_score(X, k=5)
        theirs = reference_laplacian_score(X.astype(np.float64), k=5)
        # top-10 sets should agree
        assert set(np.argsort(ours)[:10]) == set(np.argsort(theirs)[:10])

    def test_filter_by_laplacian_topn(self, rng):
        X = pd.DataFrame(
            rng.normal(size=(40, 30)).astype(np.float32),
            columns=[f"f{i}" for i in range(30)],
        )
        Xs, log = filter_by_laplacian(X, "gex", topN=10, correlation_threshold=0.9)
        assert Xs.shape[1] == 10
        assert log["selected"].sum() == 10

    def test_no_selection_when_topn_exceeds(self, rng):
        X = pd.DataFrame(rng.normal(size=(20, 5)).astype(np.float32))
        Xs, _ = filter_by_laplacian(X, "gex", topN=10)
        assert Xs.shape[1] == 5


class TestDataImporter:
    @pytest.fixture(scope="class")
    def data_path(self, tmp_path_factory):
        p = tmp_path_factory.mktemp("synth")
        write_synthetic_folder(str(p), n_train=80, n_test=40, seed=1)
        return str(p)

    def test_end_to_end_import(self, data_path):
        imp = DataImporter(
            data_path,
            ["gex", "cnv"],
            top_percentile=50,
            min_features=20,
            variance_threshold=0.01,
        )
        train, test = imp.import_data()
        assert set(train.dat.keys()) == {"gex", "cnv"}
        # harmonized features
        assert train.features["gex"] == test.features["gex"]
        assert train.dat["gex"].shape[1] == test.dat["gex"].shape[1]
        # train-normalized: mean ~0, std ~1
        assert abs(float(np.mean(train.dat["gex"]))) < 1e-4
        np.testing.assert_allclose(np.std(train.dat["gex"], axis=0), 1.0, atol=1e-3)
        # labels
        assert train.variable_types["subtype"] == "categorical"
        assert train.variable_types["age"] == "numerical"
        assert set(train.label_mappings["subtype"].values()) >= {"grp0", "grp1"}
        # missing categorical labels encoded as NaN or -1 (OrdinalEncoder keeps NaN)
        assert len(train) == train.dat["gex"].shape[0]
        # scalers stored for inference
        assert "gex" in imp.scalers

    def test_early_fusion_concat(self, data_path):
        imp = DataImporter(
            data_path, ["gex", "cnv"], concatenate=True, top_percentile=50,
            min_features=10,
        )
        train, test = imp.import_data()
        assert list(train.dat.keys()) == ["all"]
        assert train.dat["all"].shape[1] == len(train.features["all"])

    def test_covariates_modality(self, data_path):
        imp = DataImporter(
            data_path, ["gex"], covariates=["age"], top_percentile=50,
            min_features=10,
        )
        train, test = imp.import_data()
        assert "covariates" in train.dat
        assert train.dat["covariates"].shape[1] == 1

    def test_encode_labels_unknown_to_minus_one(self, data_path):
        imp = DataImporter(data_path, ["gex"], top_percentile=0)
        df_train = pd.DataFrame({"grp": ["a", "b", "a"]}, index=["s1", "s2", "s3"])
        enc, types, mapping = imp.encode_labels(df_train)
        assert types["grp"] == "categorical"
        df_test = pd.DataFrame({"grp": ["b", "zzz"]}, index=["t1", "t2"])
        enc2, _, _ = imp.encode_labels(df_test)
        assert enc2["grp"].tolist() == [1.0, -1.0]

    def test_downsample(self, data_path):
        imp = DataImporter(
            data_path, ["gex"], downsample=30, top_percentile=50, min_features=10
        )
        train, _ = imp.import_data()
        assert len(train) == 30

    def test_cleanup_drops_all_nan_sample(self, data_path, rng):
        """A fully-missing sample must be dropped, not resurrected as the
        median vector by imputation."""
        imp = DataImporter(data_path, ["gex"], top_percentile=0, na_threshold=0.5)
        df = pd.DataFrame(
            rng.normal(size=(10, 5)).astype(np.float32),
            index=[f"g{i}" for i in range(10)],
            columns=[f"S{j}" for j in range(5)],
        )
        df["S2"] = np.nan  # sample S2 entirely missing
        cleaned = imp.cleanup_data({"gex": df})
        assert "S2" not in cleaned["gex"].columns
        assert cleaned["gex"].shape[1] == 4


class TestFastCSV:
    def test_matches_pandas(self, rng, tmp_path):
        from flexynesis_tpu.data.fastcsv import read_matrix_csv

        df = pd.DataFrame(
            rng.normal(size=(200, 40)).astype(np.float32),
            index=[f"g{i}" for i in range(200)],
            columns=[f"S{j}" for j in range(40)],
        )
        df.iloc[3, 5] = np.nan
        p = tmp_path / "m.csv"
        df.to_csv(p)
        a = read_matrix_csv(str(p))
        b = pd.read_csv(p, index_col=0)
        np.testing.assert_allclose(
            a.values, b.values.astype(np.float32), atol=1e-5, equal_nan=True
        )
        assert list(a.index) == list(b.index)
        assert list(a.columns) == list(b.columns)

    def test_na_strings(self, tmp_path):
        from flexynesis_tpu.data.fastcsv import read_matrix_csv

        p = tmp_path / "na.csv"
        p.write_text(",S1,S2\ng1,1.5,NA\ng2,,nan\n")
        a = read_matrix_csv(str(p))
        assert a.loc["g1", "S1"] == 1.5
        assert np.isnan(a.loc["g1", "S2"])
        assert np.isnan(a.loc["g2", "S1"])
        assert np.isnan(a.loc["g2", "S2"])

    def test_r_style_header_falls_back_to_pandas(self, tmp_path):
        """Header with no leading index cell (R write.csv style): the native
        path must refuse and the wrapper return pandas' correct parse."""
        from flexynesis_tpu.data.fastcsv import read_matrix_csv

        p = tmp_path / "rstyle.csv"
        p.write_text("S1,S2,S3\ng1,1.0,2.0,3.0\ng2,4.0,5.0,6.0\n")
        a = read_matrix_csv(str(p))
        b = pd.read_csv(p, index_col=0)
        assert list(a.columns) == ["S1", "S2", "S3"]
        assert a.shape == (2, 3)
        np.testing.assert_allclose(a.values, b.values.astype(np.float32))

    def test_quoted_fields_fall_back_to_pandas(self, tmp_path):
        """Quoted fields containing commas must not corrupt the row."""
        from flexynesis_tpu.data.fastcsv import read_matrix_csv

        p = tmp_path / "quoted.csv"
        p.write_text(',S1,"S2,x",S3\ng1,1.0,2.0,3.0\n"g2,b",4.0,5.0,6.0\n')
        a = read_matrix_csv(str(p))
        b = pd.read_csv(p, index_col=0)
        assert list(a.columns) == list(b.columns)
        assert list(a.index) == list(b.index)
        np.testing.assert_allclose(a.values, b.values.astype(np.float32))

    def test_midfile_ragged_or_quoted_rows_fall_back(self, tmp_path):
        """A quoted or ragged row DEEP in the file (past the up-front
        header/first-row check) must also abort the native parse instead of
        silently shifting columns."""
        from flexynesis_tpu.data.fastcsv import read_matrix_csv

        ragged = tmp_path / "ragged.csv"
        ragged.write_text(
            ",S1,S2,S3\ng1,1.0,2.0,3.0\ng2,4.0,5.0\ng3,6.0,7.0,8.0\n"
        )
        quoted = tmp_path / "quoted_mid.csv"
        quoted.write_text(
            ',S1,S2,S3\ng1,1.0,2.0,3.0\n"g2,x",4.0,5.0,6.0\n'
        )
        import pytest as _pytest

        from flexynesis_tpu.data import fastcsv

        if fastcsv._ensure_built() is not None:
            with _pytest.raises(RuntimeError):
                fastcsv.read_matrix_csv(str(ragged), fallback=False)
            with _pytest.raises(RuntimeError):
                fastcsv.read_matrix_csv(str(quoted), fallback=False)
        # with fallback the wrapper must return pandas' parse of the quoted
        # file (pandas errors on the ragged one like the native path)
        b = pd.read_csv(quoted, index_col=0)
        a = read_matrix_csv(str(quoted))
        assert list(a.index) == list(b.index)
        np.testing.assert_allclose(a.values, b.values.astype(np.float32))

    def test_native_errors_without_fallback(self, tmp_path):
        """With fallback disabled the layout errors surface, not bad data."""
        import pytest as _pytest

        from flexynesis_tpu.data import fastcsv

        if fastcsv._ensure_built() is None:
            _pytest.skip("native fastcsv unavailable")
        p = tmp_path / "rstyle.csv"
        p.write_text("S1,S2,S3\ng1,1.0,2.0,3.0\n")
        with _pytest.raises(RuntimeError, match="mismatch"):
            fastcsv.read_matrix_csv(str(p), fallback=False)

    def test_trailing_garbage_field_rejected(self, tmp_path):
        """A field with a numeric prefix + garbage ('12x') makes pandas type
        the column as object; the native path must refuse, not coerce to 12."""
        import pytest as _pytest

        from flexynesis_tpu.data import fastcsv

        if fastcsv._ensure_built() is None:
            _pytest.skip("native fastcsv unavailable")
        # "NAN"/"Null"/" NA "/"Inf" are typed as str by pandas (its NA-token
        # match is exact and case-sensitive), so native must refuse them too
        for bad in ("12x", '1.0"', "1.0.5", "NAN", "Null", " NA ", "Inf"):
            p = tmp_path / "garbage.csv"
            p.write_text(f",S1,S2\ng1,1.5,{bad}\ng2,2.0,3.0\n")
            with _pytest.raises(RuntimeError):
                fastcsv.read_matrix_csv(str(p), fallback=False)
        # exact pandas NA tokens and padded numerics parse natively
        p = tmp_path / "spaces.csv"
        p.write_text(",S1,S2\ng1, 1.5 ,N/A\ng2,inf,-inf\n")
        a = fastcsv.read_matrix_csv(str(p), fallback=False)
        assert a.loc["g1", "S1"] == 1.5
        assert np.isnan(a.loc["g1", "S2"])
        assert np.isinf(a.loc["g2", "S1"]) and a.loc["g2", "S2"] < 0


class TestFastCSVFuzz:
    """Seeded adversarial-CSV fuzz vs pandas (VERDICT r2 #6): over ~100
    generated tables with quotes, CRLF, BOM, ragged rows, scientific
    notation, NA tokens, empty fields, and trailing garbage, the native
    parser must either (a) produce exactly pandas' float32 parse, or
    (b) refuse — it must never silently diverge."""

    @staticmethod
    def _gen_table(rng):
        n_rows = int(rng.integers(1, 15))
        n_cols = int(rng.integers(1, 8))

        def field():
            r = rng.random()
            if r < 0.55:
                return f"{rng.normal():.6g}"
            if r < 0.65:
                return f"{rng.normal() * 10 ** int(rng.integers(-8, 8)):e}"
            if r < 0.72:
                return str(int(rng.integers(-1000, 1000)))
            if r < 0.80:
                return ""
            if r < 0.90:
                return str(rng.choice(["NA", "NaN", "nan", "null", "NULL",
                                       "N/A", "None"]))
            if r < 0.94:
                return f" {rng.normal():.4g} "      # padded numeric
            if r < 0.97:
                return str(rng.choice(["inf", "-inf"]))
            # adversarial: garbage / partial numerics / case-variant tokens
            # that pandas types as str (native must refuse, not coerce)
            return str(rng.choice(["12x", "1.0.5", "NAN", "Null", "Inf",
                                   " NA ", "--3", "1e", "x"]))

        header_cells = [""] + [f"S{j}" for j in range(n_cols)]
        rows = []
        for i in range(n_rows):
            cells = [f"g{i}"] + [field() for _ in range(n_cols)]
            r = rng.random()
            if r < 0.05 and n_cols > 1:
                cells = cells[:-1]                   # ragged: short row
            elif r < 0.08:
                cells = cells + ["9.9"]              # ragged: long row
            elif r < 0.12:
                k = int(rng.integers(1, len(cells)))
                cells[k] = f'"{cells[k]}"'           # quoted field
            rows.append(",".join(cells))
        text = ",".join(header_cells) + "\n" + "\n".join(rows)
        if rng.random() < 0.5:
            text += "\n"
        if rng.random() < 0.15:
            text = text.replace("\n", "\r\n")
        if rng.random() < 0.1:
            text = "\ufeff" + text  # BOM
        return text

    def test_fuzz_vs_pandas(self, tmp_path):
        import pytest as _pytest

        from flexynesis_tpu.data import fastcsv

        if fastcsv._ensure_built() is None:
            _pytest.skip("native fastcsv unavailable")
        rng = np.random.default_rng(2024)
        n_native_ok = 0
        for t in range(120):
            p = tmp_path / f"fuzz_{t}.csv"
            p.write_text(self._gen_table(rng), encoding="utf-8")
            try:
                ours = fastcsv.read_matrix_csv(str(p), fallback=False)
            except RuntimeError:
                continue  # refused -> wrapper falls back to pandas: safe
            n_native_ok += 1
            # native accepted: pandas must agree byte-for-byte (as float32)
            ref = pd.read_csv(p, index_col=0)
            try:
                ref_num = ref.astype(np.float32)
            except (ValueError, TypeError):
                raise AssertionError(
                    f"table {t}: native parsed a file pandas types as "
                    f"non-numeric:\n{p.read_text()!r}"
                )
            assert ours.shape == ref_num.shape, (t, ours.shape, ref_num.shape)
            assert [str(i) for i in ours.index] == [str(i) for i in ref.index]
            assert [str(c) for c in ours.columns] == [str(c) for c in ref.columns]
            np.testing.assert_allclose(
                ours.values, ref_num.values, rtol=1e-5, atol=1e-30,
                equal_nan=True, err_msg=f"table {t}:\n{p.read_text()!r}",
            )
        # a meaningful fraction of tables must go through the native path
        # (most generated tables contain at least one adversarial field, so
        # refusing them is correct — but clean tables must parse natively)
        assert n_native_ok >= 15, n_native_ok


class TestShardedLaplacian:
    def test_matches_single_device(self, rng):
        from flexynesis_tpu.data.feature_selection import (
            laplacian_score,
            laplacian_score_sharded,
        )
        from flexynesis_tpu.parallel.mesh import get_mesh

        X = rng.normal(size=(60, 37)).astype(np.float32)  # 37 pads to 40
        mesh = get_mesh((("data", 8),))
        sharded = laplacian_score_sharded(X, k=5, mesh=mesh)
        single = laplacian_score(X, k=5)
        np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-6)
