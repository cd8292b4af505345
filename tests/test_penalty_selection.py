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


class ConstantMetricCost(StubLikelihoodCost):
    """metric constant per segment -> every segmentation scores equally
    except for the parameter penalty (so fewer changepoints always wins on
    ties within epsilon)."""

    def compute_likelihood_metric(self, start, end):
        self._resolve(start, end)
        return 0.0

    def segment_parameter_count(self, segment_length):
        return 0


class NaNMetricCost(StubLikelihoodCost):
    def compute_likelihood_metric(self, start, end):
        return float("nan")


class ThrowingMetricCost(StubLikelihoodCost):
    def compute_likelihood_metric(self, start, end):
        raise RuntimeError("boom")


class UnsupportedLikelihoodCost(StubLikelihoodCost):
    supports_information_criteria = False


def _selector_with(cost_obj, signal, min_size=1):
    p = PELT(PELTOptions(cost_function="l2", min_size=min_size))
    p.fit(np.asarray(signal, dtype=float))
    p.cost = cost_obj.fit(np.asarray(signal, dtype=float))
    return PELTPenaltySelector(p)


SIGNAL = np.array([1.0, 1.0, 1.0, 5.0, 5.0, 5.0, 1.0, 1.0, 1.0])


def test_tie_break_prefers_fewer_changepoints():
    # FitAndSelect_TieBreak_PrefersFewerChangePoints: with a constant
    # metric and zero params, all penalties score identically (k added to
    # p); the selector must keep the segmentation with fewer changepoints
    sel = _selector_with(ConstantMetricCost(), SIGNAL)
    res = sel.fit_and_select(SIGNAL, PenaltySelectionOptions(method="aic"))
    assert len(res.optimal_breakpoints) == 0


def test_likelihood_nan_handled_all_fail_raises():
    # FitAndSelect_LikelihoodCalcReturnsNaN_HandlesGracefully +
    # FitAndSelect_AllPenaltiesFail_ThrowsPELTAlgorithmException
    sel = _selector_with(NaNMetricCost(), SIGNAL)
    with pytest.raises(PELTAlgorithmError):
        sel.fit_and_select(SIGNAL, PenaltySelectionOptions(method="bic"))


def test_likelihood_throws_handled_all_fail_raises():
    # FitAndSelect_LikelihoodCalcThrowsException_HandlesGracefully
    sel = _selector_with(ThrowingMetricCost(), SIGNAL)
    with pytest.raises(PELTAlgorithmError):
        sel.fit_and_select(SIGNAL, PenaltySelectionOptions(method="bic"))


def test_unsupported_likelihood_cost_rejected():
    # FitAndSelect_LikelihoodMethod_LikelihoodCostUnsupported_Throws
    sel = _selector_with(UnsupportedLikelihoodCost(), SIGNAL)
    with pytest.raises(ValueError):
        sel.fit_and_select(SIGNAL, PenaltySelectionOptions(method="bic"))


def test_uses_penalty_range_from_options():
    # FitAndSelect_UsesPenaltyRangeFromOptions: every tested penalty lies
    # inside the user-provided [min, max]
    sel = _selector_with(StubLikelihoodCost(), SIGNAL)
    res = sel.fit_and_select(
        SIGNAL,
        PenaltySelectionOptions(method="bic", min_penalty=2.0, max_penalty=9.0),
    )
    tested = [p for p, _, _ in res.diagnostics]
    assert min(tested) >= 2.0 - 1e-12
    assert max(tested) <= 9.0 + 1e-12


def test_aicc_correction_undefined_scores_infinite():
    # FitAndSelect_AICc_ReturnsInfinityWhenCorrectionUndefined: tiny n with
    # p >= n-1 -> correction denominator <= 0 -> inf -> all penalties fail
    small = np.array([1.0, 5.0, 1.0])
    sel = _selector_with(StubLikelihoodCost(), small)  # 2 params/segment
    with pytest.raises(PELTAlgorithmError):
        sel.fit_and_select(small, PenaltySelectionOptions(method="aicc"))


def test_detect_throws_midgrid_selects_other_penalty(monkeypatch):
    """Ported: FitAndSelect_DetectThrowsException_HandlesGracefullyAndSelects
    Other — one penalty's Detect raising records a NaN diagnostic and the
    selection proceeds with the surviving penalties."""
    sig = np.ones(100)
    sel = _selector(sig)
    penalties_seen = []
    orig_detect = type(sel.pelt).detect

    def flaky_detect(self, penalty):
        penalties_seen.append(penalty)
        if len(penalties_seen) == 2:  # the middle grid point
            raise PELTAlgorithmError("Cost failed")
        return []

    monkeypatch.setattr(type(sel.pelt), "detect", flaky_detect)
    try:
        res = sel.fit_and_select(
            sig,
            PenaltySelectionOptions(
                method="BIC", min_penalty=10.0, max_penalty=30.0, num_steps=3
            ),
        )
    finally:
        monkeypatch.setattr(type(sel.pelt), "detect", orig_detect)
    assert res.selected_penalty == pytest.approx(10.0)
    assert list(res.optimal_breakpoints) == []
    assert len(res.diagnostics) == 3
    assert res.diagnostics[1][0] == pytest.approx(math.sqrt(10.0 * 30.0))
    assert math.isnan(res.diagnostics[1][1])


def test_invalid_segment_length_scores_infinite(monkeypatch):
    """Ported: FitAndSelect_InvalidSegmentLengthFromDetect_AssignsInfinite
    Score — a segmentation violating MinSize gets +inf and loses to a
    valid empty segmentation."""
    sig = np.ones(100)
    sel = _selector(sig, min_size=10)
    calls = []

    def stub_detect(self, penalty):
        calls.append(penalty)
        return [5] if len(calls) == 1 else []  # 5 < min_size -> invalid

    orig_detect = type(sel.pelt).detect
    monkeypatch.setattr(type(sel.pelt), "detect", stub_detect)
    try:
        res = sel.fit_and_select(
            sig,
            PenaltySelectionOptions(
                method="BIC", min_penalty=10.0, max_penalty=20.0, num_steps=2
            ),
        )
    finally:
        monkeypatch.setattr(type(sel.pelt), "detect", orig_detect)
    assert res.selected_penalty == pytest.approx(20.0)
    assert list(res.optimal_breakpoints) == []
    assert math.isinf(res.diagnostics[0][1])
