"""Unit tests for kernels/seasonal.py — each kernel is checked against an
independent naive implementation (the SQL-parity claims are separately
enforced by the driver-mimic oracle gate, tools/check_oracles.py)."""

import numpy as np
import pandas as pd
import pytest

from signalsharp_ray.kernels.seasonal import (
    acf_exact,
    classical_decompose,
    dense_counts,
    rolling_corr_exact,
    theil_sen,
)

HOUR = 3_600_000_000


def test_dense_counts_fills_gaps_with_zero():
    buckets = np.array([0, 2 * HOUR, 5 * HOUR], dtype=np.int64)
    counts = np.array([3, 7, 1], dtype=np.int64)
    grid, dense = dense_counts(buckets, counts, HOUR)
    assert grid.tolist() == [i * HOUR for i in range(6)]
    assert dense.tolist() == [3, 0, 7, 0, 0, 1]


def test_dense_counts_explicit_bounds_align_two_series():
    buckets = np.array([2 * HOUR, 3 * HOUR], dtype=np.int64)
    counts = np.array([5, 6], dtype=np.int64)
    grid, dense = dense_counts(buckets, counts, HOUR, lo=0, hi=4 * HOUR)
    assert grid.size == 5
    assert dense.tolist() == [0, 0, 5, 6, 0]


def test_acf_matches_naive_definition():
    rng = np.random.default_rng(7)
    x = rng.integers(0, 50, 300)
    lags, r = acf_exact(x, 10)
    xf = x.astype(float)
    m = xf.mean()
    den = ((xf - m) ** 2).sum()
    for k, rk in zip(lags, r):
        naive = ((xf[:-k] - m) * (xf[k:] - m)).sum() / den
        assert rk == pytest.approx(naive, abs=1e-9)


def test_acf_periodic_signal_peaks_at_period():
    x = np.tile(np.array([0, 10, 0, 0], dtype=np.int64), 50)
    lags, r = acf_exact(x, 8)
    assert r[3] > 0.9  # lag 4 == period
    assert r[0] < 0.0


def test_acf_constant_series_is_nan():
    _, r = acf_exact(np.full(50, 3, dtype=np.int64), 5)
    assert np.isnan(r).all()


def test_decompose_recovers_pure_seasonal_plus_trend():
    period = 24
    n = 24 * 10
    t = np.arange(n)
    seas = np.tile(np.arange(period, dtype=np.int64) * 3, n // period)
    x = 100 + 2 * t + seas  # integer: linear trend + clean daily shape
    trend, seasonal, resid, valid = classical_decompose(x, period)
    tv = np.flatnonzero(valid)
    assert tv[0] == period // 2 and tv[-1] == n - period // 2 - 1
    # centered MA of a linear trend is exact; the seasonal phase means then
    # absorb the (constant-mean) seasonal pattern, so residuals are ~0
    assert np.abs(resid[tv]).max() < 1e-9
    # trend at the window centers equals the true linear trend + mean(seas)
    mid = tv[period]
    expected = 100 + 2 * mid + seas.mean()
    assert trend[mid] == pytest.approx(expected, abs=1e-9)


def test_decompose_additivity_invariant():
    rng = np.random.default_rng(3)
    x = rng.integers(0, 100, 24 * 6)
    trend, seasonal, resid, valid = classical_decompose(x, 24)
    tv = np.flatnonzero(valid)
    np.testing.assert_allclose(
        trend[tv] + seasonal[tv] + resid[tv], x[tv].astype(float), atol=1e-9
    )


def test_decompose_odd_period_rejected():
    with pytest.raises(ValueError):
        classical_decompose(np.arange(50), 23)


def test_decompose_too_short_is_all_invalid():
    _, _, _, valid = classical_decompose(np.arange(20), 24)
    assert not valid.any()


def test_theil_sen_exact_line():
    x = (5 * np.arange(40) + 17).astype(np.int64)
    slope, intercept, n_pairs = theil_sen(x)
    assert slope == pytest.approx(5.0)
    assert intercept == pytest.approx(17.0)
    assert n_pairs == 40 * 39 // 2


def test_theil_sen_robust_to_outliers():
    x = (3 * np.arange(30)).astype(np.int64)
    x[5] = 10_000
    x[20] = -10_000
    slope, _, _ = theil_sen(x)
    assert slope == pytest.approx(3.0, abs=0.2)


def test_theil_sen_degenerate():
    slope, intercept, n_pairs = theil_sen(np.array([7], dtype=np.int64))
    assert np.isnan(slope) and np.isnan(intercept) and n_pairs == 0


def test_rolling_corr_matches_pandas():
    rng = np.random.default_rng(11)
    x = rng.integers(0, 40, 200)
    y = (x + rng.integers(-5, 6, 200)).clip(0)
    r = rolling_corr_exact(x, y, 24)
    expected = (
        pd.Series(x, dtype=float).rolling(24).corr(pd.Series(y, dtype=float))
    ).to_numpy()
    mask = np.isfinite(r)
    assert mask.sum() > 150
    np.testing.assert_allclose(r[mask], expected[mask], atol=1e-9)


def test_rolling_corr_perfect_correlation():
    x = np.arange(100, dtype=np.int64)
    r = rolling_corr_exact(x, 2 * x + 5, 10)
    assert np.isnan(r[:9]).all()
    np.testing.assert_allclose(r[9:], 1.0, atol=1e-12)
    r_anti = rolling_corr_exact(x, -3 * x, 10)
    np.testing.assert_allclose(r_anti[9:], -1.0, atol=1e-12)


def test_rolling_corr_zero_variance_window_is_nan():
    x = np.zeros(50, dtype=np.int64)
    y = np.arange(50, dtype=np.int64)
    assert np.isnan(rolling_corr_exact(x, y, 10)).all()


def test_rolling_corr_misaligned_rejected():
    with pytest.raises(ValueError):
        rolling_corr_exact(np.arange(5), np.arange(6), 3)


def test_repetition_row_counts():
    from signalsharp_ray.pipelines.queries3 import repetition_row

    # "a b a b a b" -> 2-grams: (a,b)x3, (b,a)x2 -> top2 = 3/5
    nw, top2, dup5 = repetition_row("a b a b a b")
    assert nw == 6
    assert top2 == pytest.approx(3 / 5)
    # 5-grams: (a,b,a,b,a) and (b,a,b,a,b) each once -> no dups
    assert dup5 == 0.0
    # fully repeated text: every 5-gram identical
    nw, top2, dup5 = repetition_row(" ".join(["x"] * 10))
    assert top2 == pytest.approx(1.0)
    assert dup5 == pytest.approx(1.0)
    # short docs are dropped, and split must NOT collapse runs of spaces
    assert repetition_row("a b c d") is None
    assert repetition_row("") is None
    nw, _, _ = repetition_row("a  b  c")  # 'a','','b','','c' -> 5 tokens
    assert nw == 5


def test_holt_winters_tracks_pure_seasonal_signal():
    from signalsharp_ray.kernels.extrapolation import holt_winters_forecast

    period = 24
    seas = (10 * np.sin(np.arange(period) * 2 * np.pi / period)).round().astype(int)
    x = np.tile(seas, 20) + 50  # stationary + clean daily shape
    fc = holt_winters_forecast(x, period, period=period)
    # the last observation sits at phase period-1, so h=1..period walks
    # phases 0..period-1: one full period ahead reproduces the shape
    np.testing.assert_allclose(fc, seas + 50, atol=1.5)


def test_holt_winters_linear_trend_plus_seasonal():
    from signalsharp_ray.kernels.extrapolation import holt_winters_forecast

    period = 24
    n = period * 30
    seas = np.tile(np.arange(period), n // period)
    x = 2 * np.arange(n) + 5 * seas
    fc = holt_winters_forecast(x, 6, period=period)
    truth = 2 * (np.arange(n, n + 6)) + 5 * ((np.arange(n, n + 6)) % period)
    np.testing.assert_allclose(fc, truth, rtol=0.05)


def test_holt_winters_too_short_rejected():
    from signalsharp_ray.kernels.extrapolation import holt_winters_forecast

    with pytest.raises(ValueError):
        holt_winters_forecast(np.arange(47), 3, period=24)
