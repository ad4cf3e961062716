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
    def __init__(self, X: np.ndarray, y: np.ndarray, ell: float = None,
                 noise: float = None):
        """``ell``/``noise`` given -> single Cholesky at those fixed
        hyperparameters (used for constant-liar fantasy refits inside a
        batched ask, where re-running the 24-combo grid per suggestion
        costs 24x for no information); None -> log-marginal grid fit."""
        self.X = X
        self.y_mean = float(np.mean(y))
        self.y_std = float(np.std(y)) or 1.0
        self.y = (y - self.y_mean) / self.y_std
        self._fit(ell, noise)

    def _fit(self, fixed_ell=None, fixed_noise=None):
        n = len(self.X)
        d2 = _sq_dists(self.X, self.X)
        if fixed_ell is not None and fixed_noise is not None:
            grid = [(fixed_ell, fixed_noise), (fixed_ell, 1e-1)]
        else:
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

    def _suggest_unit(self, X: np.ndarray, y: np.ndarray,
                      ell: float = None, noise: float = None) -> np.ndarray:
        gp = GaussianProcess(X, y, ell=ell, noise=noise)
        self._last_hypers = (gp.ell, gp.noise)
        d = len(self.space)
        cand = self.rng.random((self.n_candidates, d))
        # local perturbations around the incumbent sharpen exploitation
        inc = X[int(np.argmin(y))]
        local = np.clip(
            inc[None, :] + self.rng.normal(0, 0.05, (self.n_candidates // 4, d)),
            0.0,
            1.0,
        )
        cand = np.vstack([cand, local])
        mu, sigma = gp.predict(cand)
        y_best = float(np.min(y))
        scores = [
            expected_improvement(mu, sigma, y_best),
            probability_of_improvement(mu, sigma, y_best),
            lower_confidence_bound(mu, sigma),
        ]
        # probability-matching over accumulated gains (gp_hedge)
        eta = 1.0
        logits = eta * (self._gains - self._gains.max())
        probs = np.exp(logits) / np.exp(logits).sum()
        strategy = int(self.rng.choice(3, p=probs))
        self._last_strategy = strategy
        return cand[int(np.argmax(scores[strategy]))]

    def ask(self, n: int = 1) -> List[dict]:
        """Suggest n parameter dicts; batched via constant-liar fantasies.

        GP hyperparameters are grid-fitted once per ask (on the real
        history); fantasy refits between suggestions reuse them with a
        single Cholesky — ~24x cheaper per suggestion with identical
        suggestions in the common case (the fantasy points don't carry
        new information about the length scale).
        """
        out = []
        X = list(self.X)
        y = list(self.y)
        hypers = (None, None)
        for _ in range(n):
            if len(X) < self.n_initial:
                u = self.rng.random(len(self.space))
            else:
                u = self._suggest_unit(np.asarray(X), np.asarray(y), *hypers)
                hypers = self._last_hypers
            out.append(self.space.from_unit(u))
            # fantasize the current best so subsequent suggestions diversify
            X.append(self.space.to_unit(out[-1]))
            y.append(float(np.min(y)) if y else 0.0)
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
