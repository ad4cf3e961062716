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


def make_runner(extras, calls, budget_s=1000.0, est=None):
    result = {"extra": extras}
    est = est or {"a": 1, "b": 1, "canary": 1}
    return bench.SectionRunner(
        extras, result, budget_s,
        est=est,
        write=lambda r: calls.append("write"),
        free=lambda: calls.append("free"),
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
