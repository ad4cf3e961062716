"""Native Gaussian-process Bayesian optimization (ask/tell).

Replaces skopt's ``Optimizer(acq_func="gp_hedge", n_initial_points=10)``
(reference main.py:336-341) with a compact GP-EI optimizer that additionally
supports **batched ask** — the enabler for running q HPO trials in parallel
across TPU devices (constant-liar fantasies between suggestions).

Model: Matern-5/2 GP on the unit cube with standardized targets; (length
scale, noise) fitted per-ask by log-marginal-likelihood grid search (the
design matrix is <= a few hundred points — this costs microseconds on host).
Acquisition: Expected Improvement maximized over quasi-random candidates plus
perturbations of the incumbent.
"""

from __future__ import annotations

from typing import List

import numpy as np
from scipy.linalg import solve_triangular
from scipy.stats import norm

from .space import SearchSpace


def _matern52(d2: np.ndarray, ell: float) -> np.ndarray:
    d = np.sqrt(np.maximum(d2, 0.0)) / ell
    s5 = np.sqrt(5.0)
    return (1.0 + s5 * d + (5.0 / 3.0) * d * d) * np.exp(-s5 * d)


def _sq_dists(A: np.ndarray, B: np.ndarray) -> np.ndarray:
    return (
        np.sum(A * A, axis=1)[:, None]
        + np.sum(B * B, axis=1)[None, :]
        - 2.0 * A @ B.T
    )


class GaussianProcess:
    def __init__(self, X: np.ndarray, y: np.ndarray):
        """Log-marginal grid fit of (length scale, noise) + one Cholesky."""
        self.X = X
        self.y_mean = float(np.mean(y))
        self.y_std = float(np.std(y)) or 1.0
        self.y = (y - self.y_mean) / self.y_std
        self._fit()

    def _fit(self):
        n = len(self.X)
        d2 = _sq_dists(self.X, self.X)
        grid = [
            (ell, noise)
            for ell in (0.1, 0.2, 0.3, 0.5, 1.0, 2.0)
            for noise in (1e-6, 1e-4, 1e-2, 1e-1)
        ]
        best = None
        for ell, noise in grid:
            K = _matern52(d2, ell) + noise * np.eye(n)
            try:
                L = np.linalg.cholesky(K)
            except np.linalg.LinAlgError:
                continue
            alpha = solve_triangular(
                L.T, solve_triangular(L, self.y, lower=True), lower=False
            )
            lml = (
                -0.5 * float(self.y @ alpha)
                - float(np.sum(np.log(np.diag(L))))
                - 0.5 * n * np.log(2 * np.pi)
            )
            if best is None or lml > best[0]:
                best = (lml, ell, noise, L, alpha)
        _, self.ell, self.noise, self.L, self.alpha = best

    def predict(self, Xq: np.ndarray):
        Kq = _matern52(_sq_dists(Xq, self.X), self.ell)
        mu = Kq @ self.alpha
        v = solve_triangular(self.L, Kq.T, lower=True)
        var = np.maximum(1.0 - np.sum(v * v, axis=0) + self.noise, 1e-12)
        return mu * self.y_std + self.y_mean, np.sqrt(var) * self.y_std


def expected_improvement(mu, sigma, y_best, xi: float = 0.01):
    imp = y_best - mu - xi
    z = imp / sigma
    return imp * norm.cdf(z) + sigma * norm.pdf(z)


def probability_of_improvement(mu, sigma, y_best, xi: float = 0.01):
    return norm.cdf((y_best - mu - xi) / sigma)


def lower_confidence_bound(mu, sigma, kappa: float = 1.96):
    # minimization: smaller LCB = more attractive; negate so argmax works
    return -(mu - kappa * sigma)


class BayesianOptimizer:
    """Minimizing ask/tell optimizer over a SearchSpace."""

    def __init__(
        self,
        space: SearchSpace,
        n_initial_points: int = 10,
        seed: int = 42,
        n_candidates: int = 1024,
    ):
        # 1024 random + 256 incumbent-local candidates: halving the pool
        # from 2048 cut ask() cost ~2x with identical Branin/Hartmann-3
        # regret (tests/test_hpo.py::TestGPRegret) — the acquisition
        # surface over <=7 quantized dims doesn't need denser coverage
        self.space = space
        self.n_initial = n_initial_points
        self.rng = np.random.default_rng(seed)
        self.n_candidates = n_candidates
        self.X: List[np.ndarray] = []
        self.y: List[float] = []
        # gp_hedge acquisition portfolio (EI / PI / LCB), probability-matched
        # by accumulated gains — skopt Optimizer(acq_func="gp_hedge") analog
        self._gains = np.zeros(3)
        self._last_strategy: int | None = None
        self._last_hypers = (None, None)

    # ----------------------------------------------------------- persistence

    def state_dict(self) -> dict:
        return {
            "X": np.asarray(self.X).tolist(),
            "y": list(map(float, self.y)),
            "rng_state": self.rng.bit_generator.state,
            "gains": self._gains.tolist(),
        }

    def load_state_dict(self, state: dict) -> None:
        self.X = [np.asarray(x) for x in state["X"]]
        self.y = list(state["y"])
        self.rng.bit_generator.state = state["rng_state"]
        self._gains = np.asarray(state.get("gains", [0.0, 0.0, 0.0]))

    # ------------------------------------------------------------- ask/tell

    def _pick_strategy(self) -> int:
        # probability-matching over accumulated gains (gp_hedge)
        eta = 1.0
        logits = eta * (self._gains - self._gains.max())
        probs = np.exp(logits) / np.exp(logits).sum()
        return int(self.rng.choice(3, p=probs))

    def ask(self, n: int = 1) -> List[dict]:
        """Suggest n parameter dicts; batched via constant-liar fantasies.

        GP hyperparameters are grid-fitted ONCE per ask (on the real
        history); each fantasy then extends the same Cholesky factor with
        one rank-1 row — O(m^2 + C*m) per suggestion instead of a fresh
        O(m^3 + C*m^2) factorize-and-predict — and all suggestions score
        one shared candidate pool (the fantasy at a picked point collapses
        its posterior variance, so the acquisition there dies and the
        batch diversifies exactly as with per-suggestion pools, at 1/n
        the candidate-generation cost). Standardization is frozen for the
        whole ask: fantasies all sit at the incumbent value and would
        otherwise drag the mean between suggestions.
        """
        out: List[dict] = []
        X = list(self.X)
        y = list(self.y)
        # random warm-up phase
        while len(out) < n and len(X) < self.n_initial:
            u = self.rng.random(len(self.space))
            out.append(self.space.from_unit(u))
            # fantasize the current best so subsequent suggestions diversify
            X.append(self.space.to_unit(out[-1]))
            y.append(float(np.min(y)) if y else 0.0)
        n_gp = n - len(out)
        if n_gp <= 0:
            return out

        Xb = np.asarray(X)
        yb = np.asarray(y, float)
        gp = GaussianProcess(Xb, yb)  # one 24-combo grid fit per ask
        self._last_hypers = (gp.ell, gp.noise)
        ell, noise = gp.ell, gp.noise
        y_mean, y_std = gp.y_mean, gp.y_std
        d = len(self.space)

        # one shared candidate pool: quasi-random + incumbent-local points
        inc = Xb[int(np.argmin(yb))]
        cand = np.vstack([
            self.rng.random((self.n_candidates, d)),
            np.clip(
                inc[None, :]
                + self.rng.normal(0, 0.05, (self.n_candidates // 4, d)),
                0.0, 1.0,
            ),
        ])
        n_cand = cand.shape[0]

        # incremental posterior state over the growing fantasy set, in
        # preallocated buffers: L = chol(K + noise*I), w = L^-1 y_t,
        # V = L^-1 K(X, cand)
        m0 = Xb.shape[0]
        M = m0 + n_gp
        Lb = np.zeros((M, M))
        Lb[:m0, :m0] = gp.L
        Xg = np.zeros((M, d))
        Xg[:m0] = Xb
        wb = np.zeros(M)
        wb[:m0] = solve_triangular(gp.L, gp.y, lower=True)
        Vb = np.zeros((M, n_cand))
        Vb[:m0] = solve_triangular(
            gp.L, _matern52(_sq_dists(Xb, cand), ell), lower=True
        )
        y_best_t = float(np.min(gp.y))  # standardized incumbent (fantasy y*)
        y_best = y_best_t * y_std + y_mean
        m = m0
        # running posterior accumulators over the candidate pool: appending
        # fantasy row m adds Vb[m]*wb[m] to the mean and Vb[m]^2 to the
        # explained variance — O(C) per suggestion instead of O(C*m)
        mu_t = Vb[:m0].T @ wb[:m0]
        s2 = np.einsum("ij,ij->j", Vb[:m0], Vb[:m0])

        for _ in range(n_gp):
            mu = mu_t * y_std + y_mean
            var = np.maximum(1.0 - s2 + noise, 1e-12)
            sigma = np.sqrt(var) * y_std
            strategy = self._pick_strategy()
            self._last_strategy = strategy
            if strategy == 0:
                score = expected_improvement(mu, sigma, y_best)
            elif strategy == 1:
                score = probability_of_improvement(mu, sigma, y_best)
            else:
                score = lower_confidence_bound(mu, sigma)
            u = cand[int(np.argmax(score))]
            out.append(self.space.from_unit(u))

            # rank-1 fantasy update at the QUANTIZED suggestion (the point
            # the trial will actually run — quantization collapses the
            # acquisition at the true trial location, not just near it)
            xq = np.asarray(self.space.to_unit(out[-1]), float)
            k_new = _matern52(_sq_dists(Xg[:m], xq[None, :]), ell)[:, 0]
            l = solve_triangular(Lb[:m, :m], k_new, lower=True)
            lam = np.sqrt(max(1.0 + noise - float(l @ l), 1e-10))
            Lb[m, :m] = l
            Lb[m, m] = lam
            Xg[m] = xq
            wb[m] = (y_best_t - float(l @ wb[:m])) / lam
            kc_new = _matern52(_sq_dists(xq[None, :], cand), ell)[0]
            Vb[m] = (kc_new - l @ Vb[:m]) / lam
            mu_t = mu_t + Vb[m] * wb[m]
            s2 = s2 + Vb[m] * Vb[m]
            m += 1
        return out

    def tell(self, params: dict, value: float) -> None:
        value = float(value)
        if not np.isfinite(value):
            # a diverged trial (NaN/inf val loss) must not poison the GP
            # posterior or the gp_hedge gains: clamp to a value clearly
            # worse than anything observed so the optimizer learns to
            # avoid the region (skopt errors out here; clamping keeps
            # long sweeps alive)
            finite = [v for v in self.y if np.isfinite(v)]
            if finite:
                lo, hi = min(finite), max(finite)
                value = hi + max(hi - lo, abs(hi), 1.0)
            else:
                value = 1e6
        self.X.append(self.space.to_unit(params))
        self.y.append(value)
        if self._last_strategy is not None:
            # reward the strategy that produced this suggestion with the
            # (negated) observed loss — better observations grow its gain
            self._gains[self._last_strategy] += -value
            self._last_strategy = None

    @property
    def best(self):
        if not self.y:
            return None, None
        i = int(np.argmin(self.y))
        return self.space.from_unit(self.X[i]), self.y[i]
