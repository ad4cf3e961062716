"""IO round-trips: csv_to_h5 + H5DataImporter, user-graph fuzzy matching,
joblib artifacts, device management."""

import os

import numpy as np
import pandas as pd
import pytest

from flexynesis_tpu.csv_to_h5 import convert_csv_to_h5
from flexynesis_tpu.data.graph import read_user_graph
from flexynesis_tpu.data.h5 import H5DataImporter, folder_has_h5
from flexynesis_tpu.utils.synthetic import write_synthetic_folder


class TestH5Pipeline:
    def test_csv_to_h5_roundtrip(self, rng, tmp_path):
        df = pd.DataFrame(
            rng.normal(size=(50, 20)).astype(np.float32),
            index=[f"g{i}" for i in range(50)],
            columns=[f"S{j}" for j in range(20)],
        )
        src = tmp_path / "gex.csv"
        dst = tmp_path / "gex.h5"
        df.to_csv(src)
        convert_csv_to_h5(src, dst)
        back = H5DataImporter._read_h5_as_dataframe(str(dst))
        np.testing.assert_allclose(back.values, df.values, rtol=1e-6)
        assert list(back.index) == list(df.index)
        assert list(back.columns) == list(df.columns)

    def test_h5_importer_end_to_end(self, tmp_path):
        write_synthetic_folder(str(tmp_path), n_train=60, n_test=30, seed=2)
        # convert gex to h5, delete the csv for train only (csv fallback for test)
        for split in ("train", "test"):
            src = tmp_path / split / "gex.csv"
            convert_csv_to_h5(src, tmp_path / split / "gex.h5")
        os.remove(tmp_path / "train" / "gex.csv")
        assert folder_has_h5(str(tmp_path), ["gex"])
        imp = H5DataImporter(
            str(tmp_path), ["gex"], top_percentile=50, min_features=10
        )
        train, test = imp.import_data()
        assert train.dat["gex"].shape[0] == 60
        assert train.features["gex"] == test.features["gex"]


class TestUserGraph:
    def test_fuzzy_column_matching(self, tmp_path):
        p = tmp_path / "net.tsv"
        p.write_text(
            "source_gene\ttarget_gene\tconfidence\n"
            "TP53\tMDM2\t0.9\nBRCA1\tBARD1\t0.8\n"
        )
        df = read_user_graph(str(p))
        assert list(df.columns) == ["protein1", "protein2", "weight"]
        assert len(df) == 2
        assert set(df["protein1"]) == {"TP53", "BRCA1"}

    def test_two_column_graph_gets_unit_weight(self, tmp_path):
        p = tmp_path / "net.csv"
        p.write_text("GeneA,GeneB\na,b\nc,d\n")
        df = read_user_graph(str(p))
        assert (df["weight"] == 1.0).all()

    def test_positional_fallback(self, tmp_path):
        p = tmp_path / "net.csv"
        p.write_text("x1,x2,x3\ng1,g2,0.5\ng3,g4,0.7\n")
        df = read_user_graph(str(p))
        assert len(df) == 2
        assert df["weight"].tolist() == [0.5, 0.7]


class TestArtifactsJoblib:
    def test_joblib_roundtrip(self, tmp_path):
        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.inference import (
            build_artifacts,
            load_and_sniff_artifacts,
            write_artifacts,
        )

        write_synthetic_folder(str(tmp_path / "d"), n_train=40, n_test=20, seed=4)
        imp = DataImporter(
            str(tmp_path / "d"), ["gex"], top_percentile=50, min_features=10
        )
        imp.import_data()
        artifacts = build_artifacts(imp, ["gex"], ["subtype"])
        p = str(tmp_path / "a.joblib")
        write_artifacts(artifacts, p, as_json=False)
        loaded = load_and_sniff_artifacts(p)
        assert loaded["schema_version"] == 1
        assert "gex" in loaded["transforms"]
        np.testing.assert_allclose(
            loaded["transforms"]["gex"].mean_, imp.scalers["gex"].mean_
        )

    def test_json_vs_joblib_equivalence(self, tmp_path):
        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.inference import (
            build_artifacts,
            load_and_sniff_artifacts,
            write_artifacts,
        )

        write_synthetic_folder(str(tmp_path / "d"), n_train=40, n_test=20, seed=4)
        imp = DataImporter(
            str(tmp_path / "d"), ["gex"], top_percentile=50, min_features=10
        )
        imp.import_data()
        artifacts = build_artifacts(imp, ["gex"], ["subtype"])
        pj = str(tmp_path / "a.json")
        pb = str(tmp_path / "a.joblib")
        write_artifacts(artifacts, pj, as_json=True)
        write_artifacts(artifacts, pb, as_json=False)
        a = load_and_sniff_artifacts(pj)
        b = load_and_sniff_artifacts(pb)
        np.testing.assert_allclose(
            a["transforms"]["gex"].mean_, b["transforms"]["gex"].mean_
        )
        # label encoder categories survive the JSON round trip
        cats_a = list(a["label_encoders"]["subtype"].categories_[0])
        cats_b = list(b["label_encoders"]["subtype"].categories_[0])
        assert [c for c in cats_a if isinstance(c, str)] == [
            c for c in cats_b if isinstance(c, str)
        ]


class TestReferenceArtifactCompat:
    """A JSON artifact laid out exactly as the REFERENCE's writer emits it
    (reference __main__.py:1660-1771 — including the extra OrdinalEncoder
    fields and the LabelEncoder variant our own writer never produces)
    must load and drive inference-mode import (SURVEY §7.3: 'we must emit
    the same schema so reference-trained artifacts are readable')."""

    def _reference_style_json(self, imp, tmp_path):
        import json

        scaler = imp.scalers["gex"]
        enc = imp.label_encoders["subtype"]
        cats = [
            ("__NaN__" if isinstance(c, float) and np.isnan(c) else c)
            for c in enc.categories_[0]
        ]
        raw = {
            "schema_version": 1,
            "data_types": ["gex"],
            "original_modalities": ["gex"],
            "target_variables": ["subtype"],
            "covariate_vars": [],
            "join_key": "JoinKey",
            "string_organism": 9606,
            "string_node_name": "gene_name",
            "feature_lists": {"gex": list(imp.train_features["gex"])},
            "transforms": {
                "gex": {
                    "type": "StandardScaler",
                    "with_mean": True,
                    "with_std": True,
                    "mean": scaler.mean_.tolist(),
                    "scale": scaler.scale_.tolist(),
                    "var": scaler.var_.tolist(),
                    "n_features_in": int(scaler.n_features_in_),
                    "feature_names_in": list(scaler.feature_names_in_),
                    "n_samples_seen": int(np.asarray(scaler.n_samples_seen_).ravel()[0]),
                }
            },
            "label_encoders": {
                # the reference's OrdinalEncoder dict carries fields our
                # writer omits — they must be tolerated
                "subtype": {
                    "type": "OrdinalEncoder",
                    "categories": [cats],
                    "handle_unknown": "use_encoded_value",
                    "unknown_value": -1,
                    "encoded_missing_value": "__NaN__",
                    "n_features_in": 1,
                    "feature_names_in": ["subtype"],
                    "_missing_indices": {},
                    "_infrequent_enabled": False,
                },
                # and the LabelEncoder variant (reference __main__.py:1719)
                "grade": {
                    "type": "LabelEncoder",
                    "classes": ["I", "II", "III"],
                },
            },
        }
        p = str(tmp_path / "ref.artifacts.json")
        with open(p, "w") as fh:
            json.dump(raw, fh, indent=2)
        return p

    def test_reference_json_loads_and_imports(self, tmp_path):
        from flexynesis_tpu.data.importer import DataImporter
        from flexynesis_tpu.data.inference_importer import DataImporterInference
        from flexynesis_tpu.inference import load_and_sniff_artifacts

        write_synthetic_folder(str(tmp_path / "d"), n_train=40, n_test=20, seed=4)
        imp = DataImporter(
            str(tmp_path / "d"), ["gex"], top_percentile=50, min_features=10
        )
        imp.import_data()
        p = self._reference_style_json(imp, tmp_path)

        loaded = load_and_sniff_artifacts(p)
        from sklearn.preprocessing import OrdinalEncoder, StandardScaler

        assert isinstance(loaded["transforms"]["gex"], StandardScaler)
        assert isinstance(loaded["label_encoders"]["subtype"], OrdinalEncoder)
        # LabelEncoder variant normalized to the pipeline's OrdinalEncoder
        grade = loaded["label_encoders"]["grade"]
        assert isinstance(grade, OrdinalEncoder)
        assert list(grade.categories_[0]) == ["I", "II", "III"]

        inf = DataImporterInference(
            str(tmp_path / "d" / "test"), p, verbose=False
        )
        ds = inf.import_data()
        assert len(ds) > 0
        assert ds.dat["gex"].shape[1] == len(imp.train_features["gex"])
        # labels re-encoded through the artifact encoder (missing -> -1)
        labs = np.asarray(ds.ann["subtype"])
        assert np.all((labs >= -1) | np.isnan(labs))


class TestDeviceMgmt:
    def test_get_optimal_device(self):
        from flexynesis_tpu.utils.device import (
            get_device_memory_info,
            get_optimal_device,
            to_device_safe,
        )

        dev, platform = get_optimal_device()
        assert platform == "cpu"  # tests force CPU
        arr = to_device_safe(np.zeros(4, np.float64), dev)
        assert str(arr.dtype) == "float32"
        info = get_device_memory_info(dev)
        assert info["platform"] == "cpu"

    def test_requested_device_fallback(self):
        from flexynesis_tpu.utils.device import get_optimal_device

        dev, platform = get_optimal_device("cuda")  # unavailable -> fallback
        assert platform == "cpu"


class TestSafetensorsContiguity:
    def test_noncontiguous_arrays_survive_roundtrip(self, rng, tmp_path):
        """Regression: the axon TPU backend exports device arrays as
        non-C-contiguous numpy views; safetensors writes raw buffers and
        silently corrupts them unless save normalizes strides."""
        from flexynesis_tpu.inference import _flatten_pytree, _unflatten_pytree
        from safetensors.numpy import load_file, save_file

        a = np.asfortranarray(rng.normal(size=(37, 11)).astype(np.float32))
        assert not a.flags["C_CONTIGUOUS"]
        flat = _flatten_pytree({"layer": {"kernel": a}})
        p = str(tmp_path / "w.safetensors")
        save_file(flat, p)
        back = _unflatten_pytree(load_file(p))
        np.testing.assert_array_equal(back["layer"]["kernel"], a)
