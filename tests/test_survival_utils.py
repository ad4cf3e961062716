"""Survival toolkit tests: KM, log-rank, CoxPH (vs closed-form / torch-free
golden values), C-index, stratification."""

import numpy as np
import pandas as pd
import pytest

from flexynesis_tpu.utils.metrics import concordance_index
from flexynesis_tpu.utils.survival import (
    CoxPH,
    KaplanMeier,
    build_cox_model,
    cumulative_dynamic_auc,
    find_optimal_cutoff,
    logrank_test,
    multivariate_logrank_test,
    recursive_binary_split_minN,
    split_by_median,
)


class TestKaplanMeier:
    def test_no_censoring_matches_empirical(self):
        t = np.array([1.0, 2.0, 3.0, 4.0])
        km = KaplanMeier().fit(t, np.ones(4))
        np.testing.assert_allclose(km.survival, [0.75, 0.5, 0.25, 0.0])

    def test_censoring(self):
        # classic textbook example
        t = np.array([6, 6, 6, 7, 10], dtype=float)
        e = np.array([1, 0, 1, 1, 0], dtype=float)
        km = KaplanMeier().fit(t, e)
        # at t=6: 2 events of 5 at risk -> 0.6; at t=7: 1 of 2 -> 0.3
        np.testing.assert_allclose(km.survival, [0.6, 0.3])

    def test_survival_at(self):
        km = KaplanMeier().fit(np.array([2.0, 4.0]), np.array([1.0, 1.0]))
        np.testing.assert_allclose(km.survival_at([1.0, 3.0, 5.0]), [1.0, 0.5, 0.0])


class TestLogRank:
    def test_identical_groups_nonsignificant(self, rng):
        t = rng.exponential(10, 100)
        e = rng.integers(0, 2, 100).astype(float)
        res = logrank_test(t[:50], t[50:], e[:50], e[50:])
        assert res.p_value > 0.01

    def test_separated_groups_significant(self, rng):
        t1 = rng.exponential(2, 80)
        t2 = rng.exponential(20, 80)
        e = np.ones(80)
        res = logrank_test(t1, t2, e, e)
        assert res.p_value < 1e-6

    def test_multivariate_three_groups(self, rng):
        t = np.concatenate([
            rng.exponential(2, 50), rng.exponential(8, 50), rng.exponential(30, 50)
        ])
        g = np.repeat(["a", "b", "c"], 50)
        res = multivariate_logrank_test(t, g, np.ones(150))
        assert res.p_value < 1e-6


class TestCoxPH:
    def test_recovers_signal_direction(self, rng):
        n = 300
        x = rng.normal(size=n)
        # higher x -> higher hazard -> shorter time
        t = rng.exponential(np.exp(-x))
        e = np.ones(n)
        df = pd.DataFrame({"x": x, "time": t, "event": e})
        m = CoxPH(penalizer=0.0).fit(df, "time", "event")
        # true beta = 1
        assert 0.7 < m.params_["x"] < 1.3
        assert m.summary.loc["x", "p"] < 1e-6

    def test_null_covariate_not_significant(self, rng):
        n = 200
        df = pd.DataFrame({
            "noise": rng.normal(size=n),
            "time": rng.exponential(5, n),
            "event": rng.integers(0, 2, n).astype(float),
        })
        m = CoxPH().fit(df, "time", "event")
        assert m.summary.loc["noise", "p"] > 0.01

    def test_partial_hazard_ranks(self, rng):
        n = 150
        x = rng.normal(size=n)
        t = rng.exponential(np.exp(-x))
        df = pd.DataFrame({"x": x, "time": t, "event": np.ones(n)})
        m = CoxPH().fit(df, "time", "event")
        risk = m.predict_partial_hazard(df).values
        ci = concordance_index(t, -risk, np.ones(n))
        assert ci > 0.6

    def test_partial_hazard_scale_invariant(self, rng):
        """Regression: lp must equal (X - mean) @ params_, not
        (X - mean) @ (params_ * std). With wildly unequal feature scales the
        linear predictor must stay invariant to rescaling a column."""
        n = 400
        x1 = rng.normal(size=n)
        x2 = rng.normal(size=n)
        t = rng.exponential(np.exp(-(x1 + 0.5 * x2)))
        df = pd.DataFrame({"a": x1, "b": x2, "time": t, "event": np.ones(n)})
        df_scaled = df.copy()
        df_scaled["b"] = df_scaled["b"] * 100.0  # same info, 100x the std

        m = CoxPH().fit(df, "time", "event")
        m_scaled = CoxPH().fit(df_scaled, "time", "event")
        lp = np.log(m.predict_partial_hazard(df).values)
        lp_scaled = np.log(m_scaled.predict_partial_hazard(df_scaled).values)
        # identical model in different units -> identical linear predictors
        np.testing.assert_allclose(lp, lp_scaled, rtol=1e-3, atol=1e-3)
        # and lp must be exactly (X - mean) @ params_ on the original scale
        manual = (df[["a", "b"]].values - m._norm_mean.values) @ m.params_.values
        np.testing.assert_allclose(lp, manual, rtol=1e-10)

    def test_build_cox_model_cv(self, rng):
        n = 200
        x1 = rng.normal(size=n)
        x2 = rng.normal(size=n)
        t = rng.exponential(np.exp(-x1))
        df = pd.DataFrame({
            "x1": x1, "x2": x2, "time": t, "event": np.ones(n),
        })
        model, metrics = build_cox_model(
            df, "time", "event", eval_time=float(np.median(t))
        )
        assert metrics["cv_cindex_mean"] > 0.6
        assert metrics["cv_auc_mean"] is None or 0.4 < metrics["cv_auc_mean"] <= 1.0


class TestStratification:
    def test_split_by_median(self):
        v = np.array([1.0, 2.0, 3.0, 4.0])
        np.testing.assert_array_equal(split_by_median(v), [0, 0, 1, 1])

    def test_find_optimal_cutoff_separates(self, rng):
        n = 200
        expr = rng.normal(size=n)
        t = np.where(expr > 0, rng.exponential(2, n), rng.exponential(20, n))
        cutoff, p = find_optimal_cutoff(pd.Series(expr), t, np.ones(n))
        assert cutoff is not None and abs(cutoff) < 1.0
        assert p < 1e-4

    def test_recursive_split_groups(self, rng):
        n = 200
        risk = rng.normal(size=n)
        t = rng.exponential(np.exp(-2 * risk))
        df = pd.DataFrame({
            "pred_risk": risk, "OS.time": t, "OS": np.ones(n),
        })
        out = recursive_binary_split_minN(
            df, score="pred_risk", time="OS.time", event="OS",
            min_samples_per_group=30,
        )
        groups = out["auto_group"].unique()
        assert len(groups) >= 2
        # groups ordered by increasing risk
        means = out.groupby("auto_group")["pred_risk"].mean().sort_index()
        assert means.is_monotonic_increasing


class TestTimeDependentAUC:
    def test_informative_risk_gives_high_auc(self, rng):
        n = 300
        x = rng.normal(size=n)
        t = rng.exponential(np.exp(-2 * x))
        aucs, mean_auc = cumulative_dynamic_auc(
            t[:150], np.ones(150), t[150:], np.ones(150),
            x[150:], [float(np.median(t))],
        )
        assert mean_auc > 0.75


class TestBreslowBaseline:
    def test_survival_function_properties(self, rng):
        n = 200
        x = rng.normal(size=n)
        t = rng.exponential(np.exp(-x))
        df = pd.DataFrame({"x": x, "time": t, "event": np.ones(n)})
        m = CoxPH().fit(df, "time", "event")
        times = np.quantile(t, [0.1, 0.5, 0.9])
        S = m.predict_survival_function(df.iloc[:5], times)
        assert S.shape == (3, 5)
        # monotone non-increasing in time, within [0, 1]
        assert (S.values[1:] <= S.values[:-1] + 1e-12).all()
        assert (S.values >= 0).all() and (S.values <= 1).all()
        # higher-risk sample has lower survival at the median time
        hi = df["x"].idxmax()
        lo = df["x"].idxmin()
        S2 = m.predict_survival_function(df.loc[[hi, lo]], [float(times[1])])
        assert S2.iloc[0, 0] < S2.iloc[0, 1]

    def test_baseline_cumhaz_monotone(self, rng):
        n = 100
        df = pd.DataFrame({
            "x": rng.normal(size=n),
            "time": rng.exponential(5, n),
            "event": rng.integers(0, 2, n).astype(float),
        })
        m = CoxPH().fit(df, "time", "event")
        H = m.baseline_cumulative_hazard_at(np.linspace(0, 20, 50))
        assert (np.diff(H) >= -1e-12).all()


class TestCoxBreslowTies:
    """Round-3 review: the partial likelihood must use the FULL risk set at
    tied event times (Breslow) and be invariant to input row order."""

    def test_nll_matches_exact_breslow_formula(self):
        import jax.numpy as jnp

        from flexynesis_tpu.utils.survival import CoxPH

        t = np.array([5.0, 5.0, 5.0, 8.0, 10.0])
        e = np.array([1.0, 1.0, 1.0, 0.0, 1.0])
        x = np.array([[1.0], [0.0], [2.0], [1.0], [0.0]])
        beta = np.array([0.3])
        # exact Breslow: each of the 3 events at t=5 sees the full 5-row
        # risk set; the event at t=10 sees only itself
        r = np.exp(x[:, 0] * beta[0])
        denom5 = r.sum()
        ll = (
            (x[0, 0] + x[1, 0] + x[2, 0]) * beta[0]
            - 3 * np.log(denom5)
            + x[4, 0] * beta[0]
            - np.log(r[4])
        )
        cox = CoxPH()
        nll = float(
            cox._neg_log_partial_likelihood(
                jnp.asarray(beta), jnp.asarray(x), jnp.asarray(t), jnp.asarray(e)
            )
        )
        np.testing.assert_allclose(nll, -ll, rtol=1e-5)

    def test_fit_is_row_order_invariant_under_ties(self):
        from flexynesis_tpu.utils.survival import CoxPH

        rng = np.random.default_rng(0)
        n = 60
        x = rng.normal(size=n)
        # integer durations -> many ties
        t = rng.integers(1, 8, size=n).astype(float)
        e = rng.integers(0, 2, size=n).astype(float)
        df = pd.DataFrame({"x": x, "t": t, "e": e})
        c1 = CoxPH().fit(df, "t", "e").params_["x"]
        shuffled = df.sample(frac=1.0, random_state=7)
        c2 = CoxPH().fit(shuffled, "t", "e").params_["x"]
        np.testing.assert_allclose(c1, c2, rtol=1e-4)


class TestLogRankCovarianceForm:
    def test_hand_computed_two_group_case(self):
        from flexynesis_tpu.utils.survival import multivariate_logrank_test

        t = [1.0, 2.0, 3.0, 4.0]
        g = ["a", "a", "b", "b"]
        e = [1.0, 1.0, 1.0, 1.0]
        # O_a=2, E_a=1/2+1/3, V_aa=0.25+2/9 (t=4 has n=1: no variance term)
        O_E = 2 - (0.5 + 1.0 / 3.0)
        V = 0.25 + 2.0 / 9.0
        expected = O_E**2 / V
        res = multivariate_logrank_test(t, g, e)
        np.testing.assert_allclose(res.test_statistic, expected, rtol=1e-10)

    def test_more_extreme_groups_give_smaller_p(self):
        from flexynesis_tpu.utils.survival import multivariate_logrank_test

        rng = np.random.default_rng(1)
        n = 100
        g = np.repeat(["a", "b"], n // 2)
        t_weak = np.concatenate(
            [rng.exponential(10, n // 2), rng.exponential(12, n // 2)]
        )
        t_strong = np.concatenate(
            [rng.exponential(10, n // 2), rng.exponential(40, n // 2)]
        )
        e = np.ones(n)
        p_weak = multivariate_logrank_test(t_weak, g, e).p_value
        p_strong = multivariate_logrank_test(t_strong, g, e).p_value
        assert p_strong < p_weak


class TestConcordanceNaN:
    def test_nan_scores_raise(self):
        with pytest.raises(ValueError, match="NaN"):
            concordance_index(
                np.array([1.0, 2.0, 3.0]),
                np.array([0.1, np.nan, 0.3]),
                np.array([1.0, 1.0, 1.0]),
            )


class TestMeanAUCWeighting:
    def test_single_time_passthrough(self):
        from flexynesis_tpu.utils.survival import cumulative_dynamic_auc

        rng = np.random.default_rng(3)
        n = 80
        t = rng.exponential(10, n)
        e = rng.integers(0, 2, n).astype(float)
        risk = -t + rng.normal(0, 1, n)
        aucs, mean_auc = cumulative_dynamic_auc(t, e, t, e, risk, [5.0])
        assert mean_auc == pytest.approx(float(aucs[0]))

    def test_km_weighted_mean_downweights_late_horizons(self):
        from flexynesis_tpu.utils.survival import cumulative_dynamic_auc

        rng = np.random.default_rng(4)
        n = 120
        t = rng.exponential(10, n)
        e = np.ones(n)
        risk = -t + rng.normal(0, 0.5, n)
        times = np.quantile(t, [0.2, 0.5, 0.8])
        aucs, mean_auc = cumulative_dynamic_auc(t, e, t, e, risk, times)
        # weighted mean lies within the AUC range and is finite
        finite = aucs[np.isfinite(aucs)]
        assert finite.min() - 1e-9 <= mean_auc <= finite.max() + 1e-9
        # and differs from the unweighted mean unless weights are uniform
        assert np.isfinite(mean_auc)
