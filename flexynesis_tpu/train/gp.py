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

import time
from typing import List, Optional

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
    def __init__(self, X: np.ndarray, y: np.ndarray, hyper_cap: int = 512):
        """Log-marginal grid fit of (length scale, noise) + one Cholesky.

        ``hyper_cap``: above this history size, the 24-combo grid's
        log-marginal is scored on an evenly-strided subsample (the combo
        ranking is insensitive to thinning a dense design) and only the
        winning combo pays the full O(n^3) factorization — otherwise the
        grid costs 24 full Cholesky factorizations and stops hiding under
        device rounds in pipelined HPO (hpo.py). At n <= hyper_cap the fit
        is exactly the original full-grid fit.
        """
        self.X = X
        self.y_mean = float(np.mean(y))
        self.y_std = float(np.std(y)) or 1.0
        self.y = (y - self.y_mean) / self.y_std
        self._fit(hyper_cap)

    @staticmethod
    def _grid_search(X, y, d2):
        grid = [
            (ell, noise)
            for ell in (0.1, 0.2, 0.3, 0.5, 1.0, 2.0)
            for noise in (1e-6, 1e-4, 1e-2, 1e-1)
        ]
        n = len(X)
        best = None
        for ell, noise in grid:
            K = _matern52(d2, ell) + noise * np.eye(n)
            try:
                L = np.linalg.cholesky(K)
            except np.linalg.LinAlgError:
                continue
            alpha = solve_triangular(
                L.T,
                solve_triangular(L, y, lower=True, check_finite=False),
                lower=False,
                check_finite=False,
            )
            lml = (
                -0.5 * float(y @ alpha)
                - float(np.sum(np.log(np.diag(L))))
                - 0.5 * n * np.log(2 * np.pi)
            )
            if best is None or lml > best[0]:
                best = (lml, ell, noise, L, alpha)
        return best

    def _fit(self, hyper_cap: int):
        n = len(self.X)
        if n <= hyper_cap:
            d2 = _sq_dists(self.X, self.X)
            best = self._grid_search(self.X, self.y, d2)
            _, self.ell, self.noise, self.L, self.alpha = best
            return
        idx = np.unique(np.linspace(0, n - 1, hyper_cap).astype(int))
        Xs, ys = self.X[idx], self.y[idx]
        d2s = _sq_dists(Xs, Xs)
        _, self.ell, self.noise, _, _ = self._grid_search(Xs, ys, d2s)
        d2 = _sq_dists(self.X, self.X)
        K = _matern52(d2, self.ell) + self.noise * np.eye(n)
        try:
            self.L = np.linalg.cholesky(K)
        except np.linalg.LinAlgError:
            self.L = np.linalg.cholesky(K + 1e-6 * np.eye(n))
        self.alpha = solve_triangular(
            self.L.T,
            solve_triangular(self.L, self.y, lower=True, check_finite=False),
            lower=False,
            check_finite=False,
        )

    def predict(self, Xq: np.ndarray):
        Kq = _matern52(_sq_dists(Xq, self.X), self.ell)
        mu = Kq @ self.alpha
        v = solve_triangular(self.L, Kq.T, lower=True, check_finite=False)
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
        max_gp_points: int = 1024,
    ):
        # 1024 random + 256 incumbent-local candidates: halving the pool
        # from 2048 cut ask() cost ~2x with identical Branin/Hartmann-3
        # regret (tests/test_hpo.py::TestGPRegret) — the acquisition
        # surface over <=7 quantized dims doesn't need denser coverage
        self.space = space
        self.n_initial = n_initial_points
        self.rng = np.random.default_rng(seed)
        self.n_candidates = n_candidates
        # conditioning-set cap for large-budget sweeps (fanned-out rounds
        # observe K=512 results per round): beyond this, the GP conditions
        # on the best half + most recent half of the history — the exact
        # posterior is O(m^2..m^3) per ask and would stop hiding under the
        # device round. The full history is always kept for `best`,
        # checkpointing, and the hedge gains.
        self.max_gp_points = max_gp_points
        self.X: List[np.ndarray] = []
        self.y: List[float] = []
        # gp_hedge acquisition portfolio (EI / PI / LCB), probability-matched
        # by accumulated gains — skopt Optimizer(acq_func="gp_hedge") analog
        self._gains = np.zeros(3)
        # per-suggestion strategy attribution for the hedge update: maps a
        # quantized unit-cube key to the strategies that produced in-flight
        # suggestions at that point (a list — batched asks can repeat a
        # point). A plain "last strategy" scalar misattributes under
        # batched asks (n suggestions, n tells, one scalar) and under
        # pipelined asks (round N+1's session steps interleave with round
        # N's tells); entries are popped by tell(). A suggestion whose
        # trial dies is never told, so on top of the pop the map is swept
        # by age: entries older than _PENDING_TTL_TELLS tells are dropped
        # (any live pipelined suggestion is told within ~2 rounds), keeping
        # the map bounded on long sweeps with crashed trials.
        self._pending_strategy: dict = {}
        self._pending_age: dict = {}
        self._tell_count = 0

    # ----------------------------------------------------------- persistence

    def state_dict(self) -> dict:
        return {
            "X": np.asarray(self.X).tolist(),
            "y": list(map(float, self.y)),
            "rng_state": self.rng.bit_generator.state,
            "gains": self._gains.tolist(),
            # in-flight strategy attributions survive checkpoint/resume so
            # tells for suggestions that were pending at save time still
            # credit the gp_hedge gains (keys are tuples -> listified for
            # JSON; ages ride along for the staleness sweep)
            "pending_strategy": [
                [list(k), v, self._pending_age.get(k, 0)]
                for k, v in self._pending_strategy.items()
            ],
            "tell_count": self._tell_count,
        }

    def load_state_dict(self, state: dict) -> None:
        self.X = [np.asarray(x) for x in state["X"]]
        self.y = list(state["y"])
        self.rng.bit_generator.state = state["rng_state"]
        self._gains = np.asarray(state.get("gains", [0.0, 0.0, 0.0]))
        self._pending_strategy = {
            tuple(k): list(v) for k, v, _ in state.get("pending_strategy", [])
        }
        self._tell_count = int(state.get("tell_count", len(self.y)))
        self._pending_age = {
            tuple(k): int(a) for k, _, a in state.get("pending_strategy", [])
        }

    # ------------------------------------------------------------- ask/tell

    def _pick_strategy(self) -> int:
        # probability-matching over accumulated gains (gp_hedge)
        eta = 1.0
        logits = eta * (self._gains - self._gains.max())
        probs = np.exp(logits) / np.exp(logits).sum()
        return int(self.rng.choice(3, p=probs))

    def _strategy_key(self, params: dict) -> tuple:
        return tuple(
            np.round(np.asarray(self.space.to_unit(params), float), 12).tolist()
        )

    # abandoned-suggestion TTL, in tells: any live suggestion (even a
    # pipelined one noted a round early) is told within ~2 rounds of
    # <=1024 trials each, so 4096 tells of silence means the trial died
    _PENDING_TTL_TELLS = 4096

    def _note_strategy(self, params: dict, strategy: int) -> None:
        key = self._strategy_key(params)
        self._pending_strategy.setdefault(key, []).append(strategy)
        self._pending_age[key] = self._tell_count

    def _pop_strategy(self, params: dict):
        key = self._strategy_key(params)
        lst = self._pending_strategy.get(key)
        if not lst:
            return None
        s = lst.pop(0)
        if not lst:
            del self._pending_strategy[key]
            self._pending_age.pop(key, None)
        return s

    def _sweep_stale_pending(self) -> None:
        cutoff = self._tell_count - self._PENDING_TTL_TELLS
        stale = [k for k, a in self._pending_age.items() if a < cutoff]
        for k in stale:
            self._pending_strategy.pop(k, None)
            self._pending_age.pop(k, None)

    def ask(self, n: int = 1, pending: Optional[List[dict]] = None) -> List[dict]:
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

        ``pending`` conditions the whole batch on suggestions already
        dispatched but not yet observed (async-BO constant liar); see
        AskSession, which also lets the caller produce these suggestions
        incrementally while a TPU round trains.
        """
        return AskSession(self, n, pending=pending).finish()

    def ask_session(
        self, n: int, pending: Optional[List[dict]] = None
    ) -> "AskSession":
        """Resumable ask for pipelined HPO — see AskSession."""
        return AskSession(self, n, pending=pending)

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
        strategy = self._pop_strategy(params)
        if strategy is not None:
            # reward the strategy that produced this suggestion with the
            # (negated) observed loss — better observations grow its gain
            self._gains[strategy] += -value
        self._tell_count += 1
        if self._pending_strategy and self._tell_count % 512 == 0:
            self._sweep_stale_pending()  # drop never-told (crashed) entries

    @property
    def best(self):
        if not self.y:
            return None, None
        i = int(np.argmin(self.y))
        return self.space.from_unit(self.X[i]), self.y[i]


class AskSession:
    """Resumable batched ask: suggestions are produced one rank-1 step at
    a time so the host can interleave them with device work.

    Purpose: pipelined HPO (train/hpo.py). While a TPU round trains, the
    host computes the NEXT round's suggestions in the gap between a device
    chunk's dispatch and its blocking fetch (``work(budget_s)``), so
    Bayesian-optimizer time hides under device time instead of serializing
    with it — the reference's skopt optimizer is strictly sequential
    (main.py:336-341, one ask per trial between fits). Threads are
    deliberately not used: a GIL-holding tunnel call can starve a
    background thread for minutes (observed; see CLAUDE.md), while
    main-thread slicing cannot be starved.

    ``pending`` are suggestions already dispatched but not yet observed.
    They join the fantasy set at the incumbent value (constant liar,
    Ginsbourger et al. 2010) via ONE blocked Cholesky extension (BLAS-3,
    milliseconds) rather than per-point rank-1 updates, keeping session
    setup cheap; all sequential work lives in ``step()`` (~1-10 ms each).

    Math and RNG draw order for ``pending=None`` are identical to the
    original one-shot ``ask`` (equivalence-tested in tests/test_hpo.py).
    """

    def __init__(self, opt: BayesianOptimizer, n: int, pending=None):
        self.opt = opt
        self.n = int(n)
        self.out: List[dict] = []
        self._random_mode = False
        self._done = self.n <= 0
        self._pending = pending
        # setup (GP fit, pending-block Cholesky extension, candidate-pool
        # solves — ~0.5-3s at production sizes) is DEFERRED to the first
        # step()/work()/finish() call: pipelined HPO constructs the
        # session before dispatching the device round, and an eager
        # constructor would run all of that synchronously OUTSIDE the
        # dispatch->fetch gap (measured 3.3s/round un-hidden, enough to
        # flip bench e2e_pipelined below 1.0 on contended days)
        self._ready = self._done
        # observations present at construction: tells that arrive between
        # construction and the deferred setup are real observations of
        # (some of) the pending points — _setup drops those from the liar
        # set, or the GP would condition on duplicate rows with
        # conflicting values (real loss vs incumbent fantasy)
        self._n_y0 = len(opt.y)

    def _setup(self) -> None:
        if self._ready:
            return
        self._ready = True
        opt = self.opt
        pending = self._pending

        space = opt.space
        rng = opt.rng
        X = list(opt.X)
        y = list(opt.y)

        # random warm-up phase (identical to the one-shot ask); pending
        # points count toward the initial-design size like any fantasy.
        # Pending points already OBSERVED since construction (their tells
        # landed before the first step) are dropped from the liar set —
        # they are now real rows of opt.X and fantasizing them again
        # would double-count them at a conflicting (incumbent) value.
        from collections import Counter

        told_since = Counter(
            tuple(np.round(np.asarray(x, float), 12).tolist())
            for x in opt.X[self._n_y0:]
        )
        X_pend = []
        for p in (pending or []):
            xu = np.asarray(space.to_unit(p), float)
            key = tuple(np.round(xu, 12).tolist())
            if told_since.get(key, 0) > 0:
                told_since[key] -= 1
                continue
            X_pend.append(xu)
        while len(self.out) < self.n and len(X) + len(X_pend) < opt.n_initial:
            u = rng.random(len(space))
            self.out.append(space.from_unit(u))
            # fantasize the current best so subsequent suggestions diversify
            X.append(space.to_unit(self.out[-1]))
            y.append(float(np.min(y)) if y else 0.0)
        self.n_gp = self.n - len(self.out)
        if self.n_gp <= 0:
            self._done = True
            return

        # no real observations yet (pending-only history, e.g. the session
        # for round 2 created while round 1 is still in flight): there is
        # nothing to condition a GP on — explore uniformly at random
        self._random_mode = len(X) == 0
        if self._random_mode:
            return

        Xb = np.asarray(X)
        yb = np.asarray(y, float)
        cap = opt.max_gp_points
        if len(Xb) > cap:
            # condition on the best half + the most recent half (always
            # includes the incumbent); order is preserved so recency and
            # the warm-up fantasies keep their positions
            order = np.argsort(yb, kind="stable")
            keep = set(order[: cap // 2].tolist())
            for i in range(len(Xb) - 1, -1, -1):
                if len(keep) >= cap:
                    break
                keep.add(i)
            sel = np.asarray(sorted(keep))
            Xb, yb = Xb[sel], yb[sel]
        gp = GaussianProcess(Xb, yb)  # one 24-combo grid fit per session
        self.ell, self.noise = gp.ell, gp.noise
        self.y_mean, self.y_std = gp.y_mean, gp.y_std
        d = len(space)

        # one shared candidate pool: quasi-random + incumbent-local points,
        # SNAPPED to representable trial locations (to_unit(from_unit(u)))
        # so (a) the acquisition is evaluated exactly where a trial would
        # actually run, and (b) step()'s fantasy update can reuse the
        # pool's incrementally-maintained solve column (Vb[:, j]) instead
        # of a fresh O(m^2) triangular solve — scipy copies the
        # non-contiguous Lb[:m,:m] slice on every call, which made 512
        # sequential appends cost ~8s at m~1.5k (measured 2026-08-18)
        inc = Xb[int(np.argmin(yb))]
        cand = np.vstack([
            rng.random((opt.n_candidates, d)),
            np.clip(
                inc[None, :]
                + rng.normal(0, 0.05, (opt.n_candidates // 4, d)),
                0.0, 1.0,
            ),
        ])
        cand = np.asarray(
            [space.to_unit(space.from_unit(u)) for u in cand], float
        )
        self.cand = cand
        n_cand = cand.shape[0]

        # incremental posterior state over the growing fantasy set, in
        # preallocated buffers: L = chol(K + noise*I), w = L^-1 y_t,
        # V = L^-1 K(X, cand)
        m0 = Xb.shape[0]
        M = m0 + len(X_pend) + self.n_gp
        self.Lb = np.zeros((M, M))
        self.Lb[:m0, :m0] = gp.L
        self.Xg = np.zeros((M, d))
        self.Xg[:m0] = Xb
        self.wb = np.zeros(M)
        self.wb[:m0] = solve_triangular(gp.L, gp.y, lower=True, check_finite=False)
        self.Vb = np.zeros((M, n_cand))
        self.Vb[:m0] = solve_triangular(
            gp.L, _matern52(_sq_dists(Xb, cand), self.ell),
            lower=True, check_finite=False,
        )
        self.y_best_t = float(np.min(gp.y))  # standardized incumbent
        self.y_best = self.y_best_t * self.y_std + self.y_mean
        self.m = m0
        if X_pend:
            self._extend_block(np.asarray(X_pend))

        # running posterior accumulators over the candidate pool: appending
        # fantasy row m adds Vb[m]*wb[m] to the mean and Vb[m]^2 to the
        # explained variance — O(C) per suggestion instead of O(C*m)
        self.mu_t = self.Vb[: self.m].T @ self.wb[: self.m]
        self.s2 = np.einsum(
            "ij,ij->j", self.Vb[: self.m], self.Vb[: self.m]
        )

    def _extend_block(self, Xp: np.ndarray) -> None:
        """Append P known points as liar fantasies in one blocked Cholesky
        extension: L21 = K21 L11^-T, L22 = chol(K22 + noise*I - L21 L21^T).
        Escalating jitter guards near-duplicate pending rows; the per-point
        rank-1 path (whose lam floor handles exact repeats) is the
        fallback."""
        m, P = self.m, Xp.shape[0]
        L11 = self.Lb[:m, :m]
        K21 = _matern52(_sq_dists(Xp, self.Xg[:m]), self.ell)
        L21 = solve_triangular(L11, K21.T, lower=True, check_finite=False).T
        S = (
            _matern52(_sq_dists(Xp, Xp), self.ell)
            + self.noise * np.eye(P)
            - L21 @ L21.T
        )
        L22 = None
        for eps in (0.0, 1e-10, 1e-8, 1e-6, 1e-4):
            try:
                L22 = np.linalg.cholesky(S + eps * np.eye(P))
                break
            except np.linalg.LinAlgError:
                continue
        if L22 is None:
            for i in range(P):
                self._rank1_append(Xp[i])
            return
        self.Lb[m:m + P, :m] = L21
        self.Lb[m:m + P, m:m + P] = L22
        self.Xg[m:m + P] = Xp
        y_t = np.full(P, self.y_best_t)
        self.wb[m:m + P] = solve_triangular(
            L22, y_t - L21 @ self.wb[:m],
            lower=True, check_finite=False,
        )
        Kc = _matern52(_sq_dists(Xp, self.cand), self.ell)
        self.Vb[m:m + P] = solve_triangular(
            L22, Kc - L21 @ self.Vb[:m],
            lower=True, check_finite=False,
        )
        self.m = m + P

    def _rank1_append(self, xq: np.ndarray, l: np.ndarray = None) -> None:
        """Append one fantasy row. ``l`` short-circuits the triangular
        solve when the caller already holds L^-1 k(Xg[:m], xq) — true
        whenever xq is a candidate-pool point, whose column of Vb is
        exactly that vector (same forward-substitution recursion). The
        solve fallback copies the non-contiguous Lb[:m,:m] slice inside
        scipy (~m^2 doubles per call), so avoid it on hot paths."""
        m = self.m
        if l is None:
            k_new = _matern52(
                _sq_dists(self.Xg[:m], xq[None, :]), self.ell
            )[:, 0]
            l = solve_triangular(
                np.ascontiguousarray(self.Lb[:m, :m]), k_new,
                lower=True, check_finite=False,
            )
        lam = np.sqrt(max(1.0 + self.noise - float(l @ l), 1e-10))
        self.Lb[m, :m] = l
        self.Lb[m, m] = lam
        self.Xg[m] = xq
        self.wb[m] = (self.y_best_t - float(l @ self.wb[:m])) / lam
        kc_new = _matern52(_sq_dists(xq[None, :], self.cand), self.ell)[0]
        self.Vb[m] = (kc_new - l @ self.Vb[:m]) / lam
        self.m = m + 1

    @property
    def done(self) -> bool:
        return self._done

    def step(self) -> dict:
        """Produce ONE suggestion: acquisition argmax over the shared pool,
        then a rank-1 fantasy update at the QUANTIZED suggestion (the point
        the trial will actually run — quantization collapses the
        acquisition at the true trial location, not just near it)."""
        self._setup()
        if self._done:  # setup itself can finish the ask (random warm-up)
            return self.out[-1] if self.out else None
        opt = self.opt
        if self._random_mode:
            u = opt.rng.random(len(opt.space))
            params = opt.space.from_unit(u)
            self.out.append(params)
            if len(self.out) >= self.n:
                self._done = True
            return params
        mu = self.mu_t * self.y_std + self.y_mean
        var = np.maximum(1.0 - self.s2 + self.noise, 1e-12)
        sigma = np.sqrt(var) * self.y_std
        strategy = opt._pick_strategy()
        if strategy == 0:
            score = expected_improvement(mu, sigma, self.y_best)
        elif strategy == 1:
            score = probability_of_improvement(mu, sigma, self.y_best)
        else:
            score = lower_confidence_bound(mu, sigma)
        j = int(np.argmax(score))
        u = self.cand[j]
        params = opt.space.from_unit(u)
        opt._note_strategy(params, strategy)
        self.out.append(params)

        xq = np.asarray(opt.space.to_unit(params), float)
        m = self.m
        # the pool is snapped to representable points, so xq == cand[j]
        # and the append's solve result is the pool column itself
        l = self.Vb[:m, j].copy() if np.array_equal(xq, u) else None
        self._rank1_append(xq, l=l)
        self.mu_t = self.mu_t + self.Vb[m] * self.wb[m]
        self.s2 = self.s2 + self.Vb[m] * self.Vb[m]
        if len(self.out) >= self.n:
            self._done = True
        return params

    def work(self, budget_s: float) -> bool:
        """Run steps until ~budget_s seconds elapse or the session is done.

        Called between a device chunk's dispatch and its blocking fetch.
        Per-step granularity is ~1-10 ms, but the FIRST call also runs the
        deferred setup (GP fit + pending extension, ~0.5-3 s at production
        sizes) regardless of budget — by design: setup belongs in the gap,
        and the alternative (an eager constructor) ran it synchronously
        before dispatch where nothing hid it. Subsequent calls overrun
        the budget by at most one step. Returns ``done``.
        """
        t0 = time.perf_counter()
        while not self._done:
            self.step()  # always progresses: a zero budget = one step
            if time.perf_counter() - t0 >= budget_s:
                break
        return self._done

    def finish(self) -> List[dict]:
        """Complete any remaining steps and return all n suggestions."""
        while not self._done:
            self.step()
        return self.out
