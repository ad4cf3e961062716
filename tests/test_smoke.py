"""Package import smoke (reference tests/unit/test_smoke.py analog)."""


def test_import_package():
    import flexynesis_tpu

    assert flexynesis_tpu.__version__


def test_lazy_facade_surface():
    import flexynesis_tpu as fx

    for name in (
        "DataImporter", "H5DataImporter", "DataImporterInference",
        "MultiOmicDataset", "TripletMultiOmicDataset", "MultiOmicDatasetNW",
        "DirectPred", "SupervisedVAE", "MultiTripletNetwork",
        "CrossModalPred", "GNN", "MODEL_REGISTRY",
        "HyperparameterTuning", "FineTuner", "Trainer",
        "evaluate_wrapper", "get_predicted_labels",
    ):
        assert getattr(fx, name) is not None, name


def test_cli_version():
    import subprocess
    import sys

    out = subprocess.run(
        [sys.executable, "-c",
         "from flexynesis_tpu.__main__ import build_parser; "
         "build_parser().parse_args(['--help'])"],
        capture_output=True, text=True,
    )
    assert "flexynesis-tpu" in out.stdout or "model training" in out.stdout
