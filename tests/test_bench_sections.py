"""bench.py degradation-path tests (round-3 verdict item 2).

The r03 driver artifact lost three sections to one RESOURCE_EXHAUSTED
cascade: the headline engine stayed pinned in HBM and run_section had no
recovery path, so a single OOM poisoned every section behind it. These
tests drive bench.SectionRunner directly (it is module-level for exactly
this reason) with injected failures and assert: the chip is freed, the
retry runs (fallback first), a second failure records the error without
poisoning a canary section queued after it, and streamed partial results
survive a failed retry.

No TPU/JAX device work: the runner is pure host orchestration; ``free``
and ``write`` are injected fakes.
"""

import sys

import pytest

sys.path.insert(0, "/root/repo")  # bench.py lives at the repo root
import bench  # noqa: E402


class FakeOOM(Exception):
    def __str__(self):
        return "RESOURCE_EXHAUSTED: TPU backend error (ResourceExhausted)."


def make_runner(extras, calls, budget_s=1000.0, est=None, must_run=()):
    result = {"extra": extras}
    est = est or {"a": 1, "b": 1, "canary": 1}
    return bench.SectionRunner(
        extras, result, budget_s,
        est=est,
        write=lambda r: calls.append("write"),
        free=lambda: calls.append("free"),
        must_run=must_run,
    )


class TestSectionRunnerOOM:
    def test_oom_frees_then_retries_fallback(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls)

        def fails_once():
            calls.append("fn")
            raise FakeOOM()

        def fallback():
            calls.append("fallback")
            return {"value": 42}

        runner.run("a", "a", fails_once, fallback=fallback)
        # free happens BETWEEN the failure and the retry
        assert calls.index("free") > calls.index("fn")
        assert calls.index("fallback") > calls.index("free")
        assert extras["a"]["value"] == 42
        assert extras["a"]["retried_after_oom"] is True
        assert "RESOURCE_EXHAUSTED" in extras["a"]["first_error"]
        assert "elapsed_s" in extras["a"]

    def test_oom_without_fallback_retries_same_fn(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls)
        attempts = []

        def flaky():
            attempts.append(1)
            if len(attempts) == 1:
                raise FakeOOM()
            return {"value": 7}

        runner.run("a", "a", flaky)
        assert len(attempts) == 2
        assert extras["a"]["value"] == 7
        assert "free" in calls

    def test_double_oom_records_error_and_canary_survives(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls)

        def always_oom():
            raise FakeOOM()

        runner.run("a", "a", always_oom, fallback=always_oom)
        assert "error" in extras["a"]
        assert "retry" in extras["a"]["error"]
        # the chip was freed after BOTH failures (first OOM + failed retry)
        assert calls.count("free") == 2
        # a section queued behind the double failure still runs and lands
        runner.run("canary", "canary", lambda: {"ok": True})
        assert extras["canary"]["ok"] is True

    def test_non_oom_error_does_not_retry_or_free(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls)
        attempts = []

        def boom():
            attempts.append(1)
            raise ValueError("bad shapes")

        runner.run("a", "a", boom, fallback=lambda: {"value": 1})
        assert len(attempts) == 1  # no retry for non-OOM failures
        assert "free" not in calls
        assert "ValueError" in extras["a"]["error"]

    def test_streamed_partial_survives_failed_retry(self):
        # large_single_model streams a 1-pair partial via its publish hook;
        # if the section then OOMs twice, the partial (not a bare error
        # marker) must be what lands in the artifact
        extras, calls = {}, []
        runner = make_runner(extras, calls)

        def partial_then_oom():
            extras["a"] = {"samples_per_sec": 1e5, "partial": True}
            raise FakeOOM()

        runner.run("a", "a", partial_then_oom, fallback=partial_then_oom)
        assert extras["a"]["samples_per_sec"] == 1e5
        assert "error" in extras["a"]

    def test_budget_skip(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls, budget_s=0.0)
        runner.run("a", "a", lambda: pytest.fail("must not run"))
        assert extras["a"]["skipped_for_budget"] is True

    def test_no_budget_left_to_retry(self):
        # the first attempt eats the whole budget: the retry is refused
        # and the error is annotated, instead of blowing the deadline
        extras, calls = {}, []
        runner = make_runner(extras, calls, budget_s=5.0)

        def oom_and_drain():
            runner.t_start -= 100.0  # simulate a long first attempt
            raise FakeOOM()

        runner.run("a", "a", oom_and_drain,
                   fallback=lambda: pytest.fail("retry must be refused"))
        assert "no budget left to retry" in extras["a"]["error"]
        assert calls.count("free") == 1


class TestMustRunReserve:
    """Skippable sections must not eat the estimated budget of the three
    sections that went rounds 1-3 without a driver number (gnn / large /
    finetuner) — the reserve sheds the skippable one instead."""

    EST = {"s": 20, "tiny": 5, "m1": 30, "m2": 30, "vae": 20}

    def test_skippable_shed_to_protect_must_runs(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls, budget_s=70.0, est=self.EST,
                             must_run=("m1", "m2"))
        # s alone fits (20 <= 70) but 20 + reserve(60) > 70 -> shed
        runner.run("s", "s", lambda: pytest.fail("must be shed"))
        assert extras["s"]["skipped_for_budget"] is True
        assert extras["s"]["skipped_to_protect"] == ["m1", "m2"]
        # the protected sections then run on their own estimates
        runner.run("m1", "m1", lambda: {"v": 1})
        runner.run("m2", "m2", lambda: {"v": 2})
        assert extras["m1"]["v"] == 1 and extras["m2"]["v"] == 2

    def test_near_free_sections_bypass_reserve(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls, budget_s=70.0, est=self.EST,
                             must_run=("m1", "m2"))
        runner.run("tiny", "tiny", lambda: {"v": 3})  # est 5 <= exempt 8
        assert extras["tiny"]["v"] == 3

    def test_must_run_gates_on_own_estimate_only(self):
        # priority among must-runs is call order: m1 runs even though
        # m1 + m2 estimates exceed the budget; m2 then skips plainly
        extras, calls = {}, []
        runner = make_runner(extras, calls, budget_s=35.0, est=self.EST,
                             must_run=("m1", "m2"))
        runner.run("m1", "m1", lambda: {"v": 1})
        assert extras["m1"]["v"] == 1
        runner.t_start -= 10.0  # m1 "cost" 10s
        runner.run("m2", "m2", lambda: pytest.fail("over budget"))
        assert extras["m2"]["skipped_for_budget"] is True
        assert "skipped_to_protect" not in extras["m2"]

    def test_reserve_released_after_must_runs_complete(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls, budget_s=85.0, est=self.EST,
                             must_run=("m1", "m2"))
        runner.run("m1", "m1", lambda: {"v": 1})
        runner.run("m2", "m2", lambda: {"v": 2})
        # all must-runs spent: vae (est 20 <= 85 remaining) runs freely
        runner.run("vae", "vae", lambda: {"v": 4})
        assert extras["vae"]["v"] == 4

    def test_skipped_must_run_stops_reserving(self):
        extras, calls = {}, []
        runner = make_runner(extras, calls, budget_s=55.0, est=self.EST,
                             must_run=("m1", "m2"))
        runner.t_start -= 30.0  # 25s remaining: m1 (est 30) skips plainly
        runner.run("m1", "m1", lambda: pytest.fail("over budget"))
        assert extras["m1"]["skipped_for_budget"] is True
        # its reserve slot is spent: s (20 + reserve 30 for m2 > 25) still
        # sheds, but only naming m2
        runner.run("s", "s", lambda: pytest.fail("must be shed"))
        assert extras["s"]["skipped_to_protect"] == ["m2"]


class TestHeadlineCacheRelease:
    def test_free_hbm_clears_headline_cache(self):
        bench._HEADLINE_CACHE[512] = ("engine", "tr", "va")
        bench._free_hbm()
        assert not bench._HEADLINE_CACHE

    def test_main_body_frees_headline_after_e2e(self):
        # the ordering contract that broke r03: _free_hbm() must be called
        # after the e2e section and before vae/gnn/finetuner/large builds
        import inspect

        src = inspect.getsource(bench._main_body)
        i_e2e = src.index('"e2e_pipelined"')
        i_free = src.index("_free_hbm()", i_e2e)
        i_vae = src.index('"supervised_vae"')
        assert i_e2e < i_free < i_vae


class TestCompactEmission:
    """The driver's stdout tail capture is ~2000 chars; BENCH_r03's full
    JSON line outgrew it and the artifact's "parsed" came back null. The
    emitted line is a compacted view (_compact_result) with the untrimmed
    result in BENCH_FULL.json — these tests pin the length guarantee and
    that every decision number / status marker survives compaction."""

    @staticmethod
    def worst_case_result():
        long = "x" * 400
        extras = {
            "epochs_per_trial": 10,
            "n_samples": 2000,
            "features": {"gex": 2000, "cnv": 1000},
            "bound_by": long,
            "sweep_reference": long,
            "torch_cpu_trials_per_hour": 839.6,
            "torch_cpu_32core_extrapolated_trials_per_hour": 26867.2,
            "trial_count_sweep_trials_per_hour": {"512": 228353.0},
            "headline_phase_s": {"torch_baseline": 21.3, "tpu_k512": 310.4,
                                 "tpu_k512_timed_wall": 8.9},
            "best_trial_count": 512,
            "tpu_train_samples_per_sec": 1014902.0,
            "mfu_est": 0.0484,
            "vs_32core_extrapolated": 10.39,
            "torch_cpu_train_samples_per_sec": 3785.0,
            "batch_inference": {
                "tpu_samples_per_sec": 1245303.0,
                "torch_cpu_samples_per_sec": 30618.0,
                "speedup": 40.67, "elapsed_s": 33.2, "note": long,
            },
            "ig_attribution": {
                "tpu_seconds": 1.085, "torch_cpu_seconds_est": 18.6,
                "speedup": 17.2, "note": long, "elapsed_s": 8.7,
            },
            "gp_overhead": {
                "ms_per_suggestion_hist100": 1.18,
                "ms_per_suggestion_hist300": 2.81, "elapsed_s": 0.3,
            },
            "csv_ingestion": {
                "native_s": 0.256, "pandas_s": 0.948, "speedup": 3.7,
                "shape": [5000, 1000], "elapsed_s": 19.4,
            },
            "e2e_pipelined": {
                "trials_per_hour_pipelined": 224164.9,
                "trials_per_hour_sequential_ask": 160763.0,
                "pipeline_speedup": 1.394,
                "ask_fraction_hidden_under_device": 1.0,
                "phase_seconds": {
                    "p_setup": 0.0, "p_round": 16.43, "p_finish_tells": 0.02,
                    "s_ask": 6.27, "s_round": 16.64, "s_tells": 0.02,
                },
                "rounds_per_arm": 2, "trials_per_round": 512,
                "gp_history_at_end": 2048, "elapsed_s": 57.6,
            },
            "supervised_vae": {
                "tpu_trials_per_hour": 559206.0,
                "torch_cpu_trials_per_hour": 1267.1, "speedup": 441.32,
                "k_trials": 1024, "mmd_xla_us": 27997.7,
                "mmd_pallas_us": 27883.3, "elapsed_s": 81.4,
                "retried_after_oom": True, "retried_at_k": 512,
                "first_error": long,
            },
            "gnn": {
                "tpu_trials_per_hour": 282900.0, "speedup": 200.1,
                "k_trials": 512, "elapsed_s": 40.0, "note": long,
            },
            "large_single_model": {
                "samples_per_sec": 287000.0, "mfu_est": 0.716,
                "n_features": 16384, "latent_dim": 256, "batch_size": 1024,
                "paired_diffs": 2, "bound_by": long, "note": long,
                "partial": True, "elapsed_s": 158.0,
            },
            "finetuner": {
                "tpu_grid_seconds": 4.3, "torch_cpu_grid_seconds": 22.76,
                "speedup": 6.1, "grid_cells": 45, "note": long,
                "elapsed_s": 108.0,
            },
            "triplet": {
                "tpu_trials_per_hour": 613831.0,
                "torch_cpu_trials_per_hour": 2419.8, "speedup": 253.67,
                "k_trials": 512, "note": long, "elapsed_s": 63.0,
            },
            "crossmodal": {
                "tpu_trials_per_hour": 758931.2,
                "torch_cpu_trials_per_hour": 3217.7, "speedup": 235.86,
                "k_trials": 512, "note": long, "elapsed_s": 39.2,
            },
            "gnn_sparse": {
                "tpu_trials_per_hour": 66171.5,
                "train_samples_per_sec": 117638.0, "k_trials": 64,
                "n_nodes": 300, "real_edges": 598, "padded_edges": 1024,
                "note": long, "elapsed_s": 40.0,
            },
            "e2e_trials_per_hour_incl_gp": 212451.2,
            "total_wall_s": 545.6,
            "deadline_killed": True,
            "worker_error_rc": 1,
        }
        return {
            "metric": ("HPO trials/hour (DirectPred, BRCA-scale 2-omic, "
                       "512 vmapped trials)"),
            "value": 228353.0, "unit": "trials/hour",
            "vs_baseline": 272.0, "extra": extras,
        }

    def test_line_fits_driver_tail(self):
        import json

        compact = bench._compact_result(self.worst_case_result())
        line = json.dumps(compact)
        assert len(line) <= bench._MAX_LINE_CHARS, len(line)

    def test_decision_numbers_survive(self):
        compact = bench._compact_result(self.worst_case_result())
        cx = compact["extra"]
        assert compact["value"] == 228353.0
        assert cx["large_single_model"]["mfu_est"] == 0.716
        assert "bound_by" in cx["large_single_model"]
        assert cx["gnn"]["tpu_trials_per_hour"] == 282900.0
        assert cx["finetuner"]["tpu_grid_seconds"] == 4.3
        assert cx["e2e_pipelined"]["pipeline_speedup"] == 1.394
        assert cx["batch_inference"]["speedup"] == 40.67
        assert cx["ig_attribution"]["tpu_seconds"] == 1.085
        assert cx["supervised_vae"]["tpu_trials_per_hour"] == 559206.0
        assert cx["mfu_est"] == 0.0484
        assert cx["vs_32core_extrapolated"] == 10.39
        assert cx["full_result"] == "BENCH_FULL.json"
        # the round-5 sections' decision numbers must survive even the
        # worst case — they are never in _OVERFLOW_DROP_ORDER (except the
        # sparse probe) precisely because r05 exists to driver-verify them
        assert cx["triplet"]["tpu_trials_per_hour"] == 613831.0
        assert cx["triplet"]["speedup"] == 253.67
        assert cx["crossmodal"]["tpu_trials_per_hour"] == 758931.2
        assert cx["crossmodal"]["speedup"] == 235.86

    def test_vae_rotation_marker_survives_compaction(self):
        r = self.worst_case_result()
        r["extra"]["supervised_vae"] = {
            "section": "vae", "rotated_out": True,
            "driver_verified_in": "BENCH_r03+BENCH_r04",
            "remaining_s": 12.0,
        }
        compact = bench._compact_result(r)
        assert compact["extra"]["supervised_vae"]["rotated_out"] is True

    def test_status_markers_survive(self):
        compact = bench._compact_result(self.worst_case_result())
        cx = compact["extra"]
        assert cx["supervised_vae"]["retried_after_oom"] is True
        assert cx["supervised_vae"]["retried_at_k"] == 512
        assert cx["large_single_model"]["partial"] is True
        assert cx["deadline_killed"] is True
        assert cx["worker_error_rc"] == 1

    def test_error_sections_survive_truncated(self):
        r = self.worst_case_result()
        r["extra"]["gnn"] = {
            "section": "gnn", "error": "JaxRuntimeError: " + "y" * 300,
        }
        compact = bench._compact_result(r)
        err = compact["extra"]["gnn"]["error"]
        assert err.startswith("JaxRuntimeError")
        assert len(err) <= 81

    def test_unknown_sections_keep_numbers_and_status(self):
        r = self.worst_case_result()
        r["extra"]["new_section"] = {
            "some_rate": 12.5, "note": "z" * 500, "in_progress": True,
        }
        compact = bench._compact_result(r)
        sec = compact["extra"]["new_section"]
        assert sec["some_rate"] == 12.5
        assert sec["in_progress"] is True
        assert "note" not in sec

    def test_overflow_drops_low_priority_sections_first(self):
        import json

        r = self.worst_case_result()
        # force overflow: many unknown numeric sections
        for i in range(40):
            r["extra"][f"extra_section_{i}"] = {f"metric_{j}": 1.0
                                                for j in range(5)}
        compact = bench._compact_result(r)
        line = json.dumps(compact)
        # the guaranteed fallback (drop unknown sections, then shrink to
        # status markers, then drop anything non-headline) means the cap
        # HOLDS even in this adversarial case — the exact BENCH_r03
        # tail-capture failure (parsed: null) must be impossible
        assert len(line) <= bench._MAX_LINE_CHARS, len(line)
        assert compact["value"] == 228353.0
        assert "csv_ingestion" not in compact["extra"]

    def test_overflow_cap_holds_with_giant_statused_sections(self):
        import json

        # worst adversarial shape: every section is a must-keep-looking
        # dict stuffed with status markers and numbers, far past any drop
        # order — only the final headline-only fallback can save the line
        r = self.worst_case_result()
        for i in range(200):
            r["extra"][f"s{i}"] = {
                "a_rate": 1.23456789e12, "error": "x" * 200,
                "in_progress": True, "partial": True,
            }
        compact = bench._compact_result(r)
        assert len(json.dumps(compact)) <= bench._MAX_LINE_CHARS
        assert compact["value"] == 228353.0
        assert compact["extra"]["full_result"] == "BENCH_FULL.json"

    def test_worker_no_snapshot_error_survives(self):
        r = {
            "metric": "HPO trials/hour (DirectPred, BRCA-scale 2-omic, "
                      "vmapped trials)",
            "value": 0.0, "unit": "trials/hour", "vs_baseline": 0.0,
            "extra": {"error": "worker produced no snapshot"},
        }
        compact = bench._compact_result(r)
        assert compact["extra"]["error"] == "worker produced no snapshot"


class TestRealDatasetProbe:
    """FX_DATASET_DIR hook (round-4 verdict #7): a reference-layout dataset
    directory is preferred over the synthetic generator, ingested through
    DataImporter unchanged, with provenance recorded either way."""

    @staticmethod
    def _reset_provenance():
        bench._DATASET_PROVENANCE.clear()
        bench._DATASET_PROVENANCE.update(source="synthetic")

    def test_real_dataset_preferred_and_fitted(self, tmp_path, monkeypatch):
        from flexynesis_tpu.utils.synthetic import write_synthetic_folder

        write_synthetic_folder(str(tmp_path), n_train=30, n_test=10, seed=5)
        monkeypatch.setenv("FX_DATASET_DIR", str(tmp_path))
        self._reset_provenance()
        gex, cnv, cls = bench._synth()
        assert gex.shape == (bench.N_SAMPLES, bench.GEX)
        assert cnv.shape == (bench.N_SAMPLES, bench.CNV)
        assert cls.shape == (bench.N_SAMPLES,)
        assert np.all(np.isfinite(gex)) and np.all(np.isfinite(cls))
        prov = bench._DATASET_PROVENANCE
        assert prov["source"] == str(tmp_path)
        assert prov["fitted_to"] == [bench.N_SAMPLES, bench.GEX, bench.CNV]
        assert prov["original_shape"][0] <= 30

    def test_absent_env_falls_back_to_synthetic(self, monkeypatch):
        monkeypatch.delenv("FX_DATASET_DIR", raising=False)
        self._reset_provenance()
        bench._synth()
        assert bench._DATASET_PROVENANCE["source"] == "synthetic"
        assert "real_dataset_error" not in bench._DATASET_PROVENANCE

    def test_broken_dir_records_error_and_falls_back(self, tmp_path,
                                                     monkeypatch):
        monkeypatch.setenv("FX_DATASET_DIR", str(tmp_path / "missing"))
        self._reset_provenance()
        gex, _, _ = bench._synth()
        assert gex.shape == (bench.N_SAMPLES, bench.GEX)
        assert bench._DATASET_PROVENANCE["source"] == "synthetic"
        assert "real_dataset_error" in bench._DATASET_PROVENANCE

    def test_compact_line_flags_real_dataset_source(self):
        r = TestCompactEmission.worst_case_result()
        r["extra"]["dataset_provenance"] = {
            "source": "/data/lgg_gbm", "data_types": ["gex", "cnv"],
            "original_shape": [500, 12000, 8000],
            "fitted_to": [2000, 2000, 1000],
        }
        compact = bench._compact_result(r)
        # the flag may be shed by overflow handling, but when present it
        # is the short source string; the full record lives in
        # BENCH_FULL.json either way
        assert compact["extra"].get("dataset", "/data/lgg_gbm").startswith(
            "/data/lgg_gbm"[:39])

    def test_compact_line_omits_synthetic_source(self):
        r = TestCompactEmission.worst_case_result()
        r["extra"]["dataset_provenance"] = {"source": "synthetic"}
        compact = bench._compact_result(r)
        assert "dataset" not in compact["extra"]
        assert "dataset_provenance" not in compact["extra"]
