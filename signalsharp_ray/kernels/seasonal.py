"""Seasonal / dependence diagnostics over integer count series.

Every kernel here is engineered for bitwise SQL parity (the driver
hash-compares values against a DuckDB oracle): all SUMS run in exact
int64 arithmetic (order-free), and the float expressions that follow are
transcribed op-for-op into the oracle SQL, so both engines evaluate the
identical IEEE-754 operations on identical operands.

No reference counterpart (emmorts/SignalSharp has no seasonal or
dependence module); these are the standard diagnostics a production
time-series rollup engine serves on top of SURVEY.md §2, computed per
bounded series (one retention window of tier buckets).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "dense_counts",
    "acf_exact",
    "classical_decompose",
    "theil_sen",
    "rolling_corr_exact",
]


def dense_counts(bucket_us: np.ndarray, counts: np.ndarray, step_us: int,
                 lo: int | None = None, hi: int | None = None):
    """Zero-filled dense grid from min(bucket) to max(bucket) inclusive
    (or the explicit [lo, hi] bounds, for aligning multiple series).

    Returns (grid_us int64, dense int64). "No events in the bucket" means
    count 0, so zero-fill is the semantically exact densification for
    count series (unlike mean series, which need gap-fill policies).
    """
    bucket_us = np.asarray(bucket_us, dtype=np.int64)
    counts = np.asarray(counts, dtype=np.int64)
    if lo is None:
        lo = int(bucket_us.min())
    if hi is None:
        hi = int(bucket_us.max())
    grid = np.arange(lo, hi + step_us, step_us, dtype=np.int64)
    dense = np.zeros(grid.size, dtype=np.int64)
    dense[(bucket_us - lo) // step_us] = counts
    return grid, dense


def acf_exact(x: np.ndarray, max_lag: int):
    """Autocorrelation r_1..r_max_lag of an integer series.

    r_k = sum((x_t - m)(x_{t+k} - m)) / sum((x_t - m)^2) expanded so every
    SUM is an exact int64 reduction:

        num_k = P_k - m*Q_k + (n-k)*m*m      P_k = sum x_t * x_{t+k}
                                             Q_k = sum (x_t + x_{t+k})
        den   = SS - m*S                     m = S/n (the only division)

    (den follows from sum((x-m)^2) = SS - 2mS + n*m^2 with n*m = S.)
    The float expression is replicated verbatim in the SQL oracle, so the
    result is bitwise identical. Returns (lags, acf) with NaN when den==0.
    """
    x = np.asarray(x, dtype=np.int64)
    n = x.size
    S = int(x.sum())
    SS = int((x * x).sum())
    # float(S)/n, not S/n: mirrors the oracle's CAST(S AS DOUBLE)/n (S is
    # converted to double BEFORE the division on the SQL side)
    m = float(S) / n
    den = float(SS) - m * float(S)
    lags = np.arange(1, max_lag + 1, dtype=np.int64)
    out = np.full(lags.size, np.nan)
    for i, k in enumerate(lags):
        k = int(k)
        if k >= n:
            break
        a = x[:-k]
        b = x[k:]
        P = int((a * b).sum())
        Q = int(a.sum()) + int(b.sum())
        num = float(P) - m * float(Q) + (n - k) * m * m
        if den != 0.0:
            out[i] = num / den
    return lags, out


def classical_decompose(x: np.ndarray, period: int):
    """Classical additive decomposition with an even-period centered MA.

    trend_t = (x[t-h] + 2*sum(x[t-h+1 .. t+h-1]) + x[t+h]) / (2*period)
    with h = period/2 (period must be even) — the numerator is an exact
    int64; the single division is the only float op, so trend is bitwise
    reproducible in SQL from the same window sums.

    seasonal(phase) = mean over t≡phase of (x_t - trend_t), computed
    exactly: sum(x - trend) over a phase = (2p*sum(x) - sum(num2)) / (2p),
    all int64, then two float divisions (by 2p, then by the phase count).
    The seasonal is NOT re-centered (no float-ordered mean of means) —
    that is this operator's documented spec, mirrored by the oracle.

    residual = x - trend - seasonal (same op order both sides).

    Returns (trend, seasonal_per_t, residual, valid_mask); entries outside
    the full centered window are NaN with valid_mask False.
    """
    if period % 2 != 0:
        raise ValueError("classical_decompose requires an even period")
    x = np.asarray(x, dtype=np.int64)
    n = x.size
    h = period // 2
    two_p = 2 * period
    trend = np.full(n, np.nan)
    seasonal = np.full(n, np.nan)
    resid = np.full(n, np.nan)
    valid = np.zeros(n, dtype=bool)
    if n < period + 1:
        return trend, seasonal, resid, valid

    # num2[t] = x[t-h] + 2*sum(x[t-h+1..t+h-1]) + x[t+h], exact int64
    csum = np.concatenate(([0], np.cumsum(x, dtype=np.int64)))
    t_idx = np.arange(h, n - h, dtype=np.int64)
    inner = csum[t_idx + h] - csum[t_idx - h + 1]
    num2 = x[t_idx - h] + 2 * inner + x[t_idx + h]
    trend[t_idx] = num2 / float(two_p)
    valid[t_idx] = True

    phases = (t_idx % period).astype(np.int64)
    seas_by_phase = np.full(period, np.nan)
    for p in range(period):
        sel = phases == p
        if not sel.any():
            continue
        cnt = int(sel.sum())
        # exact: sum(x - num2/2p) * 2p = 2p*sum(x) - sum(num2)
        dnum = two_p * int(x[t_idx[sel]].sum()) - int(num2[sel].sum())
        seas_by_phase[p] = float(dnum) / float(two_p) / cnt
    seasonal[t_idx] = seas_by_phase[phases]
    resid[t_idx] = x[t_idx] - trend[t_idx] - seasonal[t_idx]
    return trend, seasonal, resid, valid


def theil_sen(x: np.ndarray):
    """Theil–Sen robust trend of an integer series over index 0..n-1.

    slope = median over all i<j of (x_j - x_i)/(j - i); intercept =
    median(x) - slope * median(idx). Medians are np.quantile linear ==
    DuckDB quantile_cont bitwise; each pairwise slope is a single float
    division of exact ints, identical both sides. O(n^2) pairs — callers
    apply it to tier-resolution series (n = retention buckets, bounded).

    Returns (slope, intercept, n_pairs).
    """
    x = np.asarray(x, dtype=np.int64)
    n = x.size
    if n < 2:
        return float("nan"), float("nan"), 0
    i, j = np.triu_indices(n, k=1)
    slopes = (x[j] - x[i]).astype(np.float64) / (j - i).astype(np.float64)
    slope = float(np.quantile(slopes, 0.5))
    med_x = float(np.quantile(x.astype(np.float64), 0.5))
    med_i = float(np.quantile(np.arange(n, dtype=np.float64), 0.5))
    intercept = med_x - slope * med_i
    return slope, intercept, int(slopes.size)


def rolling_corr_exact(x: np.ndarray, y: np.ndarray, window: int):
    """Rolling Pearson correlation of two aligned integer series.

    All five window sums (Sx, Sy, Sxx, Syy, Sxy) are exact int64 prefix
    differences; the correlation

        r = (w*Sxy - Sx*Sy) / (sqrt(w*Sxx - Sx*Sx) * sqrt(w*Syy - Sy*Sy))

    is then the identical float expression in numpy and SQL (IEEE sqrt is
    correctly rounded everywhere). Returns an array aligned to the input
    with NaN before the first full window and where either variance is 0.
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    if x.size != y.size:
        raise ValueError("series must be aligned")
    n = x.size
    out = np.full(n, np.nan)
    if n < window:
        return out

    def wsum(v):
        c = np.concatenate(([0], np.cumsum(v, dtype=np.int64)))
        return c[window:] - c[:-window]

    Sx = wsum(x)
    Sy = wsum(y)
    Sxx = wsum(x * x)
    Syy = wsum(y * y)
    Sxy = wsum(x * y)
    w = np.int64(window)
    num = (w * Sxy - Sx * Sy).astype(np.float64)
    vx = (w * Sxx - Sx * Sx).astype(np.float64)
    vy = (w * Syy - Sy * Sy).astype(np.float64)
    den = np.sqrt(vx) * np.sqrt(vy)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.where(den > 0.0, num / den, np.nan)
    out[window - 1 :] = r
    return out
