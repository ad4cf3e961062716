"""Smoke-run the example tutorials (the reference exercises its notebook
tutorials in CI via papermill — tutorials-template.yml:42-77; ours are
plain scripts run in-process on the CPU mesh with FX_TUTORIAL_FAST)."""

import importlib.util
import os

import pytest

EXAMPLES = os.path.join(os.path.dirname(__file__), "..", "examples")


def _run_tutorial(name, monkeypatch):
    monkeypatch.setenv("FX_TUTORIAL_FAST", "1")
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(EXAMPLES, f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main()


@pytest.mark.parametrize(
    "name",
    [
        "brca_subtype_tutorial",
        "survival_subtypes_tutorial",
        "gnn_custom_networks_tutorial",
        "crossmodal_translation_tutorial",
        "cbioportal_tutorial",
    ],
)
def test_tutorial_runs(name, monkeypatch):
    _run_tutorial(name, monkeypatch)
