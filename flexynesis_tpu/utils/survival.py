"""Survival analysis toolkit, implemented natively (no lifelines/sksurv).

Capability parity with the reference's survival helpers in
/root/reference/flexynesis/utils.py:
* Kaplan-Meier curves + log-rank test        (:177-294)
* ``find_optimal_cutoff``                    (:1234-1271)
* ``recursive_binary_split_minN``            (:1272-1348)
* ``build_cox_model`` with K-fold CV C-index
  and single-horizon time-dependent AUC      (:1419-1518)
* ``plot_hazard_ratios`` forest plot         (:1351-1416)
* ``split_by_median``                        (:412-414)

The Cox proportional-hazards fitter replaces lifelines.CoxPHFitter: Newton-
Raphson on the Breslow partial likelihood with an L2 penalizer, with the
gradient/Hessian produced by jax.grad/jax.hessian so the same code runs on
TPU for wide feature panels. The time-dependent AUC is the IPCW
cumulative/dynamic estimator (sksurv.metrics.cumulative_dynamic_auc
equivalent).
"""

from __future__ import annotations

from collections import deque
from typing import Optional, Tuple

import numpy as np
import pandas as pd
from scipy import stats as scipy_stats


# ------------------------------------------------------------ Kaplan-Meier


class KaplanMeier:
    """Product-limit survival estimator."""

    def __init__(self):
        self.timeline = None
        self.survival = None

    def fit(self, durations, events=None):
        durations = np.asarray(durations, dtype=float)
        events = (
            np.ones_like(durations)
            if events is None
            else np.asarray(events, dtype=float)
        )
        order = np.argsort(durations)
        t, e = durations[order], events[order]
        uniq = np.unique(t[e == 1]) if (e == 1).any() else np.array([])
        n = len(t)
        surv = []
        s = 1.0
        for ti in uniq:
            d = np.sum((t == ti) & (e == 1))
            at_risk = np.sum(t >= ti)
            s *= 1.0 - d / at_risk
            surv.append(s)
        self.timeline = uniq
        self.survival = np.asarray(surv)
        return self

    def survival_at(self, times):
        """S(t) evaluated with right-continuous steps."""
        if self.timeline is None or len(self.timeline) == 0:
            return np.ones_like(np.asarray(times, dtype=float))
        idx = np.searchsorted(self.timeline, np.asarray(times, float), side="right")
        s = np.concatenate([[1.0], self.survival])
        return s[idx]


class LogRankResult:
    def __init__(self, statistic: float, p_value: float):
        self.test_statistic = statistic
        self.p_value = p_value


def logrank_test(t1, t2, e1, e2, alpha: float = 0.95) -> LogRankResult:
    """Two-group log-rank test (chi-square, 1 df)."""
    t1, t2 = np.asarray(t1, float), np.asarray(t2, float)
    e1, e2 = np.asarray(e1, float), np.asarray(e2, float)
    t = np.concatenate([t1, t2])
    e = np.concatenate([e1, e2])
    g = np.concatenate([np.zeros(len(t1)), np.ones(len(t2))])
    event_times = np.unique(t[e == 1])
    O1 = E1 = V = 0.0
    for ti in event_times:
        at_risk = t >= ti
        n = at_risk.sum()
        n1 = (at_risk & (g == 0)).sum()
        d = ((t == ti) & (e == 1)).sum()
        d1 = ((t == ti) & (e == 1) & (g == 0)).sum()
        O1 += d1
        E1 += d * n1 / n
        if n > 1:
            V += d * (n1 / n) * (1 - n1 / n) * (n - d) / (n - 1)
    stat = (O1 - E1) ** 2 / V if V > 0 else 0.0
    p = float(scipy_stats.chi2.sf(stat, df=1))
    return LogRankResult(float(stat), p)


def multivariate_logrank_test(durations, groups, events) -> LogRankResult:
    """K-group log-rank test (chi-square, K-1 df).

    Computes the exact quadratic-form statistic Z' V^-1 Z over the
    hypergeometric variance-covariance of (O - E), like
    lifelines.statistics.multivariate_logrank_test (the reference's import,
    utils.py:40) — NOT the conservative sum((O-E)^2/E) textbook
    approximation, which understates the statistic under unbalanced group
    sizes or heavy censoring.
    """
    t = np.asarray(durations, float)
    e = np.asarray(events, float)
    g = np.asarray(groups)
    labels = [lb for lb in pd.unique(g) if not (isinstance(lb, float) and np.isnan(lb))]
    K = len(labels)
    if K < 2:
        return LogRankResult(0.0, 1.0)
    O = np.zeros(K)
    E = np.zeros(K)
    V = np.zeros((K, K))
    for ti in np.unique(t[e == 1]):
        at_risk = t >= ti
        n = at_risk.sum()
        d = ((t == ti) & (e == 1)).sum()
        nk = np.array([(at_risk & (g == lb)).sum() for lb in labels], float)
        dk = np.array(
            [((t == ti) & (e == 1) & (g == lb)).sum() for lb in labels], float
        )
        O += dk
        E += d * nk / n
        if n > 1:
            frac = nk / n
            V += (
                d
                * (n - d)
                / (n - 1)
                * (np.diag(frac) - np.outer(frac, frac))
            )
    z = (O - E)[:-1]
    Vsub = V[:-1, :-1]
    try:
        stat = float(z @ np.linalg.solve(Vsub, z))
    except np.linalg.LinAlgError:
        stat = float(z @ np.linalg.pinv(Vsub) @ z)
    stat = max(stat, 0.0)
    p = float(scipy_stats.chi2.sf(stat, df=K - 1))
    return LogRankResult(stat, p)


# ------------------------------------------------------------------ Cox PH


class CoxPH:
    """Cox proportional hazards via Newton-Raphson (Breslow ties) + L2.

    API mirrors the lifelines.CoxPHFitter subset the reference consumes:
    ``fit(df, duration_col, event_col)``, ``predict_partial_hazard``,
    ``params_``, ``hazard_ratios_``, ``standard_errors_``, ``summary``.
    """

    def __init__(self, penalizer: float = 0.0, max_iter: int = 100,
                 tol: float = 1e-7):
        self.penalizer = penalizer
        self.max_iter = max_iter
        self.tol = tol

    def _neg_log_partial_likelihood(self, beta, X, t, e):
        import jax.numpy as jnp

        risk = X @ beta
        order = jnp.argsort(-t)
        t_s = t[order]
        risk_s = risk[order]
        e_s = e[order]
        m = jnp.max(risk_s)
        csum = jnp.cumsum(jnp.exp(risk_s - m))
        # Breslow ties: the denominator at an event time is the FULL risk
        # set {j : t_j >= t_i}, including rows tied with i that happen to
        # sort after it — take the cumsum at each tie group's last
        # position (the naive per-row cumsum is order-dependent under ties
        # and matches neither Breslow nor Efron; lifelines is Breslow by
        # default, and _fit_baseline already sums full risk sets)
        a = -t_s  # ascending view of the descending-time sort
        grp_end = jnp.searchsorted(a, a, side="right") - 1
        log_cum = jnp.log(csum[grp_end]) + m
        ll = jnp.sum(e_s * (risk_s - log_cum))
        return -ll + 0.5 * self.penalizer * jnp.sum(beta**2) * X.shape[0]

    def fit(self, df: pd.DataFrame, duration_col: str, event_col: str):
        import warnings

        import jax
        import jax.numpy as jnp

        feats = [c for c in df.columns if c not in (duration_col, event_col)]
        X_df = df[feats].astype(float)
        self._norm_mean = X_df.mean(axis=0)
        self._norm_std = X_df.std(axis=0).replace(0, 1.0)
        Xn = (X_df - self._norm_mean) / self._norm_std
        X = jnp.asarray(Xn.values, jnp.float64 if jax.config.jax_enable_x64
                        else jnp.float32)
        t = jnp.asarray(df[duration_col].values, X.dtype)
        e = jnp.asarray(df[event_col].values, X.dtype)

        f = lambda b: self._neg_log_partial_likelihood(b, X, t, e)
        f_jit = jax.jit(f)
        grad = jax.jit(jax.grad(f))
        hess = jax.jit(jax.hessian(f))

        # Newton with step-halving (lifelines-style): a full step can
        # overshoot under monotone likelihood (a perfectly separating
        # feature) or collinearity, silently driving beta to inf/NaN —
        # halve until the NLL improves, warn and stop if it never does
        beta = jnp.zeros(len(feats), X.dtype)
        nll = float(f_jit(beta))
        converged = False
        accepted = True
        for _ in range(self.max_iter):
            g = grad(beta)
            H = hess(beta) + 1e-9 * jnp.eye(len(feats), dtype=X.dtype)
            step = jnp.linalg.solve(H, g)
            accepted = False
            scale = 1.0
            # f32 NLL noise near the optimum is ~1e-6 relative — accept
            # steps that hold the likelihood within that band
            slack = 1e-6 * (1.0 + abs(nll))
            for _h in range(8):
                cand = beta - scale * step
                nll_c = float(f_jit(cand))
                if np.isfinite(nll_c) and nll_c <= nll + slack:
                    accepted = True
                    break
                scale *= 0.5
            if not accepted:
                if float(jnp.max(jnp.abs(step))) < 10 * self.tol:
                    # at the optimum: the step is negligible and the line
                    # search only sees float noise — that's convergence
                    converged = True
                else:
                    warnings.warn(
                        "CoxPH Newton step failed to improve the likelihood "
                        "(possible monotone likelihood or collinearity); "
                        "stopping at the last stable iterate."
                    )
                break
            delta = float(jnp.max(jnp.abs(cand - beta)))
            beta, nll = cand, nll_c
            if delta < self.tol:
                converged = True
                break
        if not converged and accepted:
            warnings.warn(
                f"CoxPH did not converge in {self.max_iter} iterations."
            )

        H = np.asarray(hess(beta))
        cov = np.linalg.inv(H + 1e-9 * np.eye(len(feats)))
        beta_n = np.asarray(beta)
        # un-standardize coefficients
        std = self._norm_std.values
        coef = beta_n / std
        se = np.sqrt(np.maximum(np.diag(cov), 0)) / std

        self.features_ = feats
        self.duration_col = duration_col
        self.event_col = event_col
        self.params_ = pd.Series(coef, index=feats, name="coef")
        self.standard_errors_ = pd.Series(se, index=feats, name="se(coef)")
        self.hazard_ratios_ = pd.Series(np.exp(coef), index=feats,
                                        name="exp(coef)")
        z = np.divide(coef, se, out=np.zeros_like(coef), where=se > 0)
        p = 2 * scipy_stats.norm.sf(np.abs(z))
        ci = 1.959963984540054
        self.summary = pd.DataFrame(
            {
                "coef": coef,
                "exp(coef)": np.exp(coef),
                "se(coef)": se,
                "coef lower 95%": coef - ci * se,
                "coef upper 95%": coef + ci * se,
                "exp(coef) lower 95%": np.exp(coef - ci * se),
                "exp(coef) upper 95%": np.exp(coef + ci * se),
                "z": z,
                "p": p,
            },
            index=pd.Index(feats, name="covariate"),
        )
        self._fit_baseline(df)
        return self

    def predict_partial_hazard(self, df: pd.DataFrame) -> pd.Series:
        # params_ are already on the original (un-standardized) feature scale,
        # so lp = (X - mean) @ params_ == ((X - mean)/std) @ beta_normalized.
        X = df[self.features_].astype(float)
        lp = (X - self._norm_mean).values @ self.params_.values
        # equivalent to exp(X @ coef) up to a constant factor, as lifelines
        return pd.Series(np.exp(lp), index=df.index)

    def _fit_baseline(self, df: pd.DataFrame) -> None:
        """Breslow baseline cumulative hazard H0(t) at the mean covariates."""
        t = df[self.duration_col].to_numpy(dtype=float)
        e = df[self.event_col].to_numpy(dtype=float)
        risk = self.predict_partial_hazard(df).to_numpy()
        order = np.argsort(t)
        t_s, e_s, r_s = t[order], e[order], risk[order]
        # cumulative risk set sums from the end
        rev_cumsum = np.cumsum(r_s[::-1])[::-1]
        event_times = np.unique(t_s[e_s == 1])
        H = []
        h = 0.0
        for ti in event_times:
            d = np.sum((t_s == ti) & (e_s == 1))
            at_risk = rev_cumsum[np.searchsorted(t_s, ti, side="left")]
            h += d / max(at_risk, 1e-12)
            H.append(h)
        self._baseline_times = event_times
        self._baseline_cumhaz = np.asarray(H)

    def baseline_cumulative_hazard_at(self, times) -> np.ndarray:
        if not hasattr(self, "_baseline_times"):
            raise RuntimeError("Call fit() first.")
        idx = np.searchsorted(
            self._baseline_times, np.asarray(times, float), side="right"
        )
        H = np.concatenate([[0.0], self._baseline_cumhaz])
        return H[idx]

    def predict_survival_function(
        self, df: pd.DataFrame, times=None
    ) -> pd.DataFrame:
        """S(t | x) = exp(-H0(t) * exp(lp(x))) — Breslow estimator.

        Returns a (times x samples) DataFrame, matching lifelines'
        orientation.
        """
        if times is None:
            times = self._baseline_times
        H0 = self.baseline_cumulative_hazard_at(times)
        risk = self.predict_partial_hazard(df).to_numpy()
        surv = np.exp(-np.outer(H0, risk))
        return pd.DataFrame(surv, index=np.asarray(times), columns=df.index)


# lifelines-compatible alias used in notebooks
CoxPHFitter = CoxPH


# -------------------------------------------------- time-dependent AUC


def cumulative_dynamic_auc(
    train_durations, train_events, test_durations, test_events, risk, times
):
    """IPCW cumulative/dynamic AUC(t) (sksurv-equivalent interface subset).

    Returns (auc_per_time, mean_auc). ``mean_auc`` follows sksurv's
    definition: the AUC(t) curve integrated against the Kaplan-Meier
    estimate of the TEST survival function, normalized by
    1 - S(times[-1]) — not an unweighted mean (late horizons with few
    at-risk samples are down-weighted, exactly as in
    sksurv.metrics.cumulative_dynamic_auc). NaN horizons (no cases or no
    controls) are excluded with their weights renormalized.
    """
    km_cens = KaplanMeier().fit(
        np.asarray(train_durations, float),
        1.0 - np.asarray(train_events, float),
    )
    t = np.asarray(test_durations, float)
    e = np.asarray(test_events, float)
    r = np.asarray(risk, float)
    aucs = []
    for tau in np.atleast_1d(times):
        is_case = (t <= tau) & (e == 1)
        is_ctrl = t > tau
        if is_case.sum() == 0 or is_ctrl.sum() == 0:
            aucs.append(np.nan)
            continue
        G = km_cens.survival_at(np.minimum(t, tau))
        w = np.where(is_case, 1.0 / np.maximum(G, 1e-12), 0.0)
        num = 0.0
        for i in np.where(is_case)[0]:
            gt = (r[i] > r[is_ctrl]).sum() + 0.5 * (r[i] == r[is_ctrl]).sum()
            num += w[i] * gt
        den = w[is_case].sum() * is_ctrl.sum()
        aucs.append(num / den if den > 0 else np.nan)
    aucs = np.asarray(aucs)

    times_arr = np.atleast_1d(np.asarray(times, float))
    if len(times_arr) == 1:
        return aucs, float(aucs[0])
    km_surv = KaplanMeier().fit(t, e)
    s_times = km_surv.survival_at(times_arr)
    d = -np.diff(np.concatenate([[1.0], s_times]))
    finite = np.isfinite(aucs)
    wsum = d[finite].sum()
    mean_auc = (
        float(np.sum(aucs[finite] * d[finite]) / wsum)
        if wsum > 0
        else float("nan")
    )
    return aucs, mean_auc


# ---------------------------------------------------- cutoffs / stratification


def split_by_median(v):
    """Binary split of a vector by its median (reference utils.py:412-414)."""
    v = np.asarray(v, dtype=float)
    return (v > np.nanmedian(v)).astype(float)


def find_optimal_cutoff(
    expression, time, event, min_percent=0.1, max_percent=0.9, step=0.01
) -> Tuple[Optional[float], float]:
    """Best expression cutoff by log-rank p-value over a quantile grid."""
    expression = pd.Series(np.asarray(expression, float))
    time = np.asarray(time, float)
    event = np.asarray(event, float)
    quantiles = np.arange(min_percent, max_percent, step)
    cutoffs = expression.quantile(quantiles).unique()
    best_p, best_cutoff = 1.0, None
    for cutoff in cutoffs:
        group = expression.values > cutoff
        if group.all() or (~group).all():
            continue
        res = logrank_test(time[group], time[~group], event[group], event[~group])
        if res.p_value < best_p:
            best_p, best_cutoff = res.p_value, float(cutoff)
    return best_cutoff, best_p


def recursive_binary_split_minN(
    df: pd.DataFrame,
    score: str = "pred_risk",
    time: str = "OS.time",
    event: str = "OS",
    alpha: float = 0.05,
    min_samples_per_group: int = 25,
) -> pd.DataFrame:
    """Recursive risk stratification into G1..Gk by optimal log-rank cutoffs."""
    df = df.copy()
    groups = {}
    next_gid = 0
    queue = deque([df])
    while queue:
        node = queue.popleft()
        if len(node) < 2 * min_samples_per_group:
            groups.update({i: next_gid for i in node.index})
            next_gid += 1
            continue
        try:
            cutoff, pval = find_optimal_cutoff(
                node[score], node[time], node[event]
            )
        except Exception:
            cutoff, pval = None, 1.0
        if cutoff is None or pval >= alpha:
            groups.update({i: next_gid for i in node.index})
            next_gid += 1
            continue
        left = node[node[score] <= cutoff]
        right = node[node[score] > cutoff]
        if len(left) < min_samples_per_group or len(right) < min_samples_per_group:
            groups.update({i: next_gid for i in node.index})
            next_gid += 1
            continue
        queue.append(left)
        queue.append(right)

    df["auto_group"] = df.index.map(groups)
    t_series = pd.to_numeric(df[time], errors="coerce")
    early = t_series <= t_series.median()
    risk_by_gid = {}
    for g in sorted(df["auto_group"].unique()):
        in_g = df["auto_group"] == g
        sel = in_g & early if (in_g & early).any() else in_g
        risk_by_gid[g] = float(pd.to_numeric(df.loc[sel, score], errors="coerce").mean())
    ordered = sorted(risk_by_gid, key=lambda x: (risk_by_gid[x], x))
    df["auto_group"] = df["auto_group"].map(
        {old: f"G{i + 1}" for i, old in enumerate(ordered)}
    )
    return df


# ------------------------------------------------------------ model builder


def build_cox_model(
    df: pd.DataFrame,
    duration_col: str,
    event_col: str,
    n_splits: int = 5,
    random_state: int = 42,
    eval_time: Optional[float] = None,
    low_variance_threshold: float = 0.01,
    cox_penalizer: float = 0.05,
    return_metrics: bool = True,
):
    """Fit CoxPH with K-fold CV C-index (+ optional horizon AUC)."""
    from sklearn.model_selection import KFold

    from .metrics import concordance_index

    events = df[event_col].astype(bool)
    low_var = [
        c
        for c in df.drop(columns=[duration_col, event_col]).columns
        if df.loc[events, c].var() < low_variance_threshold
        or df.loc[~events, c].var() < low_variance_threshold
    ]
    if low_var:
        print("Removed low variance features:", low_var)
        df = df.drop(columns=low_var)

    metrics = {"cv_cindex_mean": None, "cv_auc_mean": None}
    kf = KFold(n_splits=n_splits, shuffle=True, random_state=random_state)
    c_indices, aucs = [], []
    for tr, te in kf.split(df):
        train_df, test_df = df.iloc[tr], df.iloc[te]
        model = CoxPH(penalizer=cox_penalizer).fit(
            train_df, duration_col, event_col
        )
        risk = model.predict_partial_hazard(test_df).values
        c_indices.append(
            concordance_index(
                test_df[duration_col].values, -risk,
                test_df[event_col].astype(int).values,
            )
        )
        if eval_time is not None:
            tmin = float(test_df[duration_col].min())
            tmax = float(test_df[duration_col].max())
            if tmin < float(eval_time) < tmax:
                auc, _ = cumulative_dynamic_auc(
                    train_df[duration_col], train_df[event_col],
                    test_df[duration_col], test_df[event_col],
                    risk, [float(eval_time)],
                )
                if np.isfinite(auc[0]):
                    aucs.append(float(auc[0]))
    metrics["cv_cindex_mean"] = float(np.mean(c_indices)) if c_indices else None
    metrics["cv_auc_mean"] = float(np.mean(aucs)) if aucs else None

    final = CoxPH(penalizer=cox_penalizer).fit(df, duration_col, event_col)
    if return_metrics:
        return final, metrics
    return final
