"""Penalty selection behavioral tests (FIXTURES.md §2.7,
SignalSharp.Tests/Detection/PELTPenaltySelectorTests.cs re-expressed with a
stub likelihood cost: metric(s,e) = e - s, 2 params per segment)."""

import math

import numpy as np
import pytest

from signalsharp_ray.common.exceptions import PELTAlgorithmError
from signalsharp_ray.kernels.costs.base import LikelihoodCostFunction
from signalsharp_ray.kernels.pelt import PELT, PELTOptions
from signalsharp_ray.kernels.penalty_selection import (
    PELTPenaltySelector,
    PenaltySelectionOptions,
    _log_spaced_penalties,
)


class StubLikelihoodCost(LikelihoodCostFunction):
    """metric(s,e) = e - s; segment cost = L2-like constant; 2 params/segment."""

    def fit(self, signal):
        arr = np.atleast_2d(np.asarray(signal, dtype=float))
        self._n_dims, self._n_points = arr.shape
        self._sig = arr
        return self

    def compute_cost(self, start=None, end=None):
        s, e, n = self._resolve(start, end)
        seg = self._sig[:, s:e]
        mu = seg.mean(axis=1, keepdims=True)
        return float(np.sum((seg - mu) ** 2))

    def compute_likelihood_metric(self, start, end):
        s, e, _ = self._resolve(start, end)
        return float(e - s)

    def segment_parameter_count(self, segment_length):
        return 2


def _selector(signal, min_size=1):
    opts = PELTOptions(cost_function=StubLikelihoodCost(), min_size=min_size)
    return PELTPenaltySelector(PELT(opts))


def test_bic_scoring_formula():
    sig = np.array([1.0, 1, 1, 5, 5, 5, 1, 1, 1] * 4)
    sel = _selector(sig)
    res = sel.fit_and_select(sig, PenaltySelectionOptions(method="bic"))
    n = sig.size
    # with metric = sum of segment lengths == n always, the score is
    # n + (2*(K+1) + K)*ln(n): minimized at K=0 -> expects no changepoints
    assert res.selected_penalty > 0
    assert len(res.optimal_breakpoints) == 0
    scores = {k: s for (_, s, k) in res.diagnostics if not math.isnan(s)}
    assert scores[0] == pytest.approx(n + 2 * math.log(n))


def test_aic_and_aicc_scores():
    rng = np.random.default_rng(0)
    sig = rng.normal(0.0, 0.05, 100)  # no real changepoints
    sel = _selector(sig)
    res_aic = sel.fit_and_select(sig, PenaltySelectionOptions(method="aic"))
    # stub metric is always n, so AIC = 100 + 2*(3K+2): minimized at K=0
    assert len(res_aic.optimal_breakpoints) == 0
    scores = {k: s for (_, s, k) in res_aic.diagnostics if not math.isnan(s)}
    assert scores[0] == pytest.approx(100 + 4)

    res_aicc = sel.fit_and_select(sig, PenaltySelectionOptions(method="aicc"))
    scores_c = {k: s for (_, s, k) in res_aicc.diagnostics if not math.isnan(s)}
    p = 2.0
    assert scores_c[0] == pytest.approx(100 + 4 + 2 * p * (p + 1) / (100 - p - 1))


def test_real_gaussian_selection_finds_changepoints():
    rng = np.random.default_rng(11)
    sig = np.concatenate(
        [rng.normal(0, 1, 80), rng.normal(8, 1, 80), rng.normal(-5, 1, 80)]
    )
    opts = PELTOptions(cost_function="gaussian", min_size=3)
    sel = PELTPenaltySelector(PELT(opts))
    res = sel.fit_and_select(sig, PenaltySelectionOptions(method="bic"))
    # must recover the two regime changes (BIC may admit one extra split)
    assert 2 <= len(res.optimal_breakpoints) <= 3
    bkps = [int(b) for b in res.optimal_breakpoints]
    assert any(abs(b - 80) <= 2 for b in bkps)
    assert any(abs(b - 160) <= 2 for b in bkps)


def test_non_likelihood_cost_rejected():
    opts = PELTOptions(cost_function="l2")
    sel = PELTPenaltySelector(PELT(opts))
    with pytest.raises(ValueError):
        sel.fit_and_select([1.0, 2, 3, 4], PenaltySelectionOptions(method="bic"))


def test_unknown_method_rejected():
    sig = np.arange(10.0)
    with pytest.raises(ValueError):
        _selector(sig).fit_and_select(sig, PenaltySelectionOptions(method="xyz"))


def test_log_spaced_grid_properties():
    grid = _log_spaced_penalties(1.0, 100.0, 10)
    assert grid[0] == pytest.approx(1.0)
    assert grid[-1] == pytest.approx(100.0)
    assert all(b > a for a, b in zip(grid, grid[1:]))

    zero_grid = _log_spaced_penalties(0.0, 10.0, 5)
    assert zero_grid[0] == 0.0
    assert zero_grid[-1] == pytest.approx(10.0)


def test_heuristic_min_penalty():
    # min_p = max(0.1, params * ln n) with the stub's 2 params
    sig = np.arange(50.0)
    sel = _selector(sig)
    sel.pelt.fit(sig)
    lik = sel._likelihood_fn()
    assert sel._estimate_min_penalty(50, lik) == pytest.approx(2 * math.log(50))
    assert sel._estimate_max_penalty(50, 7.8) == pytest.approx(
        max(50 * math.log(50), 20 * 7.8)
    )
