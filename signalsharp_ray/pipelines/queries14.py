"""Round-3 batch 16: classical randomness / stability tests over the
hourly load series — the turning-point test (local-extrema count vs the
2(n-2)/3 i.i.d. expectation), the Wald-Wolfowitz runs test (runs above /
below the mean with the exact-integer above flag), Allan variance at
multiple averaging times (the clock-stability statistic, exact integer
numerators), and the Hurst rescaled-range exponent (long-memory
estimator via the R/S log-log slope).

House parity: extrema, run counts and above-flags are pure integer
comparisons (above = n*H > S — no float mean crosses the compare);
Allan numerators are exact int64 sums of squared bin diffs; every
z-score / variance / R-S value is ONE transcribed float expression over
exact integer ingredients; the R/S per-window averages and the slope's
moment sums run as ascending-order left-folds (the token_entropy
list_sum contract), with the per-window-size averages anchored at
ROUND(,6) on both sides before the log-log regression (the
iqr_outliers anchor pattern).

Scale contracts: hourly count tables reduce through one
hash_bucket_aggregate exchange and are retention-bounded (~720 rows per
month per type), so every driver-side fold is over a bounded profile,
never the event table.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries6 import HOUR_US, _hourly_counts

QUERIES14: dict = {}
ORACLES14: dict = {}

HURST_WINDOWS = (24, 48, 96)
ALLAN_TAUS = (1, 2, 4)


def _fold(vals) -> float:
    """Sequential left-fold sum — bitwise-equal to DuckDB
    list_sum(list(x ORDER BY ...)) over the same ascending doubles."""
    f = 0.0
    for x in vals:
        f = f + float(x)
    return f


def _dense_totals(sf_dir: str) -> np.ndarray:
    """Total events per hour on the dense [min, max] hourly grid
    (missing hours = 0) — retention-bounded, exact int64."""
    agg = _hourly_counts(sf_dir)
    per = agg.groupby("hour_us")["n_sum"].sum()
    lo = int(per.index.min())
    hi = int(per.index.max())
    grid_n = (hi - lo) // HOUR_US + 1
    v = np.zeros(grid_n, dtype=np.int64)
    v[(per.index.to_numpy(np.int64) - lo) // HOUR_US] = per.to_numpy(np.int64)
    return v


# ---------------------------------------------------------------------------
# Turning-point test
# ---------------------------------------------------------------------------


def q_turning_points(sf_dir: str):
    """Per event type: count of strict local extrema (peaks + valleys)
    among interior hours of the present-hour count series, against the
    i.i.d. expectation 2(n-2)/3 and variance (16n-29)/90 — the classical
    turning-point randomness test. Extrema are integer comparisons; the
    z-score is one transcribed float expression."""
    agg = _hourly_counts(sf_dir)
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        v = g.sort_values("hour_us")["n_sum"].to_numpy(np.int64)
        n = v.size
        if n < 3:
            continue  # oracle filters HAVING COUNT(*) >= 3
        mid, left, right = v[1:-1], v[:-2], v[2:]
        tp = int(
            (((mid > left) & (mid > right)) | ((mid < left) & (mid < right))).sum()
        )
        mu = 2.0 * float(n - 2) / 3.0
        var = (16.0 * float(n) - 29.0) / 90.0
        z = (float(tp) - mu) / math.sqrt(var)
        rows.append((t, n, tp, float(_r6away(mu)), float(_r6away(z))))
    return pd.DataFrame(
        rows, columns=["event_type", "n_hours", "n_turning", "expected", "zscore"]
    ).astype({"n_hours": np.int64, "n_turning": np.int64})


ORACLES14["turning_points"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
x AS (
  SELECT event_type, n,
         LAG(n) OVER w AS p, LEAD(n) OVER w AS q
  FROM h WINDOW w AS (PARTITION BY event_type ORDER BY bh)
),
t AS (
  SELECT event_type, COUNT(*) AS n_hours,
         COUNT(*) FILTER (WHERE p IS NOT NULL AND q IS NOT NULL
                          AND ((n > p AND n > q) OR (n < p AND n < q))) AS tp
  FROM x GROUP BY 1 HAVING COUNT(*) >= 3
)
SELECT event_type,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(tp AS BIGINT) AS n_turning,
       ROUND(2.0 * CAST(n_hours - 2 AS DOUBLE) / 3.0, 6) AS expected,
       ROUND((CAST(tp AS DOUBLE) - 2.0 * CAST(n_hours - 2 AS DOUBLE) / 3.0)
             / sqrt((16.0 * CAST(n_hours AS DOUBLE) - 29.0) / 90.0), 6) AS zscore
FROM t
"""


# ---------------------------------------------------------------------------
# Wald-Wolfowitz runs test
# ---------------------------------------------------------------------------


def q_runs_test(sf_dir: str):
    """Per event type: the Wald-Wolfowitz runs test of the hourly count
    series against its mean. The above-mean flag is the EXACT integer
    compare n*H > S (never a float mean), so the run boundaries carry no
    rounding surface; expectation mu = 2*n1*n2/H + 1 and variance
    (mu-1)(mu-2)/(H-1) are one transcribed float expression each. Types
    where 2*n1*n2 <= H (degenerate variance) are excluded on both
    sides."""
    agg = _hourly_counts(sf_dir)
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        v = g.sort_values("hour_us")["n_sum"].to_numpy(np.int64)
        n = v.size
        s = int(v.sum())
        above = v * n > s
        n1 = int(above.sum())
        n2 = n - n1
        if 2 * n1 * n2 <= n:
            continue
        r = 1 + int((above[1:] != above[:-1]).sum())
        mu = 2.0 * float(n1) * float(n2) / float(n) + 1.0
        var = (mu - 1.0) * (mu - 2.0) / (float(n) - 1.0)
        z = (float(r) - mu) / math.sqrt(var)
        rows.append((t, n, n1, r, float(_r6away(mu)), float(_r6away(z))))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_hours", "n_above", "n_runs", "expected", "zscore"],
    ).astype({"n_hours": np.int64, "n_above": np.int64, "n_runs": np.int64})


ORACLES14["runs_test"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS s, COUNT(*) AS nh
  FROM h GROUP BY 1
),
f AS (
  SELECT h.event_type, h.bh,
         CASE WHEN h.n * t.nh > t.s THEN 1 ELSE 0 END AS ab
  FROM h JOIN tot t USING (event_type)
),
r AS (
  SELECT event_type, ab,
         LAG(ab) OVER (PARTITION BY event_type ORDER BY bh) AS pab
  FROM f
),
agg AS (
  SELECT event_type,
         CAST(SUM(ab) AS BIGINT) AS n1,
         1 + COUNT(*) FILTER (WHERE pab IS NOT NULL AND ab != pab) AS runs
  FROM r GROUP BY 1
),
mu AS (
  SELECT a.event_type, t.nh, a.n1, a.runs,
         2.0 * CAST(a.n1 AS DOUBLE) * CAST(t.nh - a.n1 AS DOUBLE)
           / CAST(t.nh AS DOUBLE) + 1.0 AS mu
  FROM agg a JOIN tot t USING (event_type)
  WHERE 2 * a.n1 * (t.nh - a.n1) > t.nh
)
SELECT event_type,
       CAST(nh AS BIGINT) AS n_hours,
       n1 AS n_above,
       CAST(runs AS BIGINT) AS n_runs,
       ROUND(mu, 6) AS expected,
       ROUND((CAST(runs AS DOUBLE) - mu)
             / sqrt((mu - 1.0) * (mu - 2.0) / (CAST(nh AS DOUBLE) - 1.0)), 6)
         AS zscore
FROM mu
"""


# ---------------------------------------------------------------------------
# Allan variance of the hourly load
# ---------------------------------------------------------------------------


def q_allan_variance(sf_dir: str):
    """Allan variance of total hourly load at averaging times tau in
    {1,2,4} hours over the dense grid: sigma^2(tau) =
    sum((y_{j+1}-y_j)^2) / (2 (M-1) tau^2) with y_j the exact int64
    tau-bin sums — the clock-stability statistic distinguishing white
    from drift noise. The squared-diff numerator stays an exact int64;
    the variance is one transcribed division."""
    v = _dense_totals(sf_dir)
    rows = []
    for tau in ALLAN_TAUS:
        nb = v.size // tau
        if nb < 2:
            continue
        y = v[: nb * tau].reshape(nb, tau).sum(axis=1)
        d = np.diff(y)
        num = int((d * d).sum())
        avar = float(num) / (2.0 * float(nb - 1) * float(tau) * float(tau))
        rows.append((tau, nb, num, float(_r6away(avar))))
    return pd.DataFrame(
        rows, columns=["tau_hours", "n_bins", "sq_sum", "avar"]
    ).astype({"tau_hours": np.int64, "n_bins": np.int64, "sq_sum": np.int64})


ORACLES14["allan_variance"] = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT CAST(COALESCE(h.n, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY g.bh) - 1 AS idx
  FROM grid g LEFT JOIN h USING (bh)
),
tot AS (SELECT COUNT(*) AS n FROM dense),
taus AS (SELECT unnest([1, 2, 4]) AS tau),
bins AS (
  SELECT t.tau, d.idx // t.tau AS j, CAST(SUM(d.v) AS BIGINT) AS y
  FROM dense d CROSS JOIN taus t, tot
  WHERE d.idx < (tot.n // t.tau) * t.tau
  GROUP BY 1, 2
),
diffs AS (
  SELECT tau, y - LAG(y) OVER (PARTITION BY tau ORDER BY j) AS d
  FROM bins
),
agg AS (
  SELECT tau,
         COUNT(*) AS nb,
         CAST(SUM(d * d) AS BIGINT) AS num
  FROM diffs GROUP BY 1 HAVING COUNT(*) >= 2
)
SELECT CAST(tau AS BIGINT) AS tau_hours,
       CAST(nb AS BIGINT) AS n_bins,
       num AS sq_sum,
       ROUND(CAST(num AS DOUBLE)
             / (2.0 * CAST(nb - 1 AS DOUBLE) * CAST(tau AS DOUBLE)
                * CAST(tau AS DOUBLE)), 6) AS avar
FROM agg
"""


# ---------------------------------------------------------------------------
# Hurst rescaled-range exponent
# ---------------------------------------------------------------------------


def q_hurst_rs(sf_dir: str):
    """Hurst exponent of total hourly load by rescaled-range analysis:
    split the dense grid into non-overlapping windows of W in {24,48,96}
    hours; per window R/S = (max-min of cumulative mean deviations) /
    population std (windows with zero variance excluded on both sides);
    per-W average R/S is a left-fold anchored at ROUND(,6); the Hurst
    estimate is the least-squares slope of ln(avg R/S) on ln(W), with
    every moment sum an ascending-W left-fold. H ~ 0.5 = memoryless,
    H > 0.5 = persistent (long-memory) load."""
    v = _dense_totals(sf_dir)
    n = v.size
    pts = []
    for w in HURST_WINDOWS:
        nw = n // w
        if nw < 1:
            continue
        m = v[: nw * w].reshape(nw, w)
        s = m.sum(axis=1)
        ss = (m * m).sum(axis=1)
        c = np.cumsum(m, axis=1)
        k = np.arange(1, w + 1, dtype=np.float64)
        sf = s.astype(np.float64)
        dev = c.astype(np.float64) - (k[None, :] * sf[:, None]) / float(w)
        rng = dev.max(axis=1) - dev.min(axis=1)
        mean = sf / float(w)
        var = ss.astype(np.float64) / float(w) - mean * mean
        ok = var > 0.0
        rs = rng[ok] / np.sqrt(var[ok])
        if rs.size == 0:
            continue
        avg = float(_r6away(_fold(rs) / float(rs.size)))  # ascending-wid fold
        pts.append((w, int(rs.size), avg))
    xs = [math.log(float(w)) for w, _, _ in pts]
    ys = [math.log(a) for _, _, a in pts]
    mcount = float(len(pts))
    xbar = _fold(xs) / mcount
    ybar = _fold(ys) / mcount
    sxy = _fold([(x - xbar) * (y - ybar) for x, y in zip(xs, ys)])
    sxx = _fold([(x - xbar) * (x - xbar) for x in xs])
    hurst = float(_r6away(sxy / sxx))
    return pd.DataFrame(
        [(w, nw, avg, hurst) for (w, nw, avg) in pts],
        columns=["window_h", "n_windows", "avg_rs", "hurst"],
    ).astype({"window_h": np.int64, "n_windows": np.int64})


ORACLES14["hurst_rs"] = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT CAST(COALESCE(h.n, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY g.bh) - 1 AS idx
  FROM grid g LEFT JOIN h USING (bh)
),
tot AS (SELECT COUNT(*) AS n FROM dense),
ws AS (SELECT unnest([24, 48, 96]) AS w),
assigned AS (
  SELECT ws.w, d.idx // ws.w AS wid, d.idx % ws.w + 1 AS k, d.v
  FROM dense d CROSS JOIN ws, tot
  WHERE d.idx < (tot.n // ws.w) * ws.w
),
pre AS (
  SELECT w, wid, k, v,
         SUM(v) OVER (PARTITION BY w, wid ORDER BY k) AS c,
         SUM(v) OVER (PARTITION BY w, wid) AS s,
         SUM(v * v) OVER (PARTITION BY w, wid) AS ss
  FROM assigned
),
dev AS (
  SELECT w, wid, s, ss,
         CAST(c AS DOUBLE)
           - (CAST(k AS DOUBLE) * CAST(s AS DOUBLE)) / CAST(w AS DOUBLE) AS dv
  FROM pre
),
winstat AS (
  SELECT w, wid,
         MAX(dv) - MIN(dv) AS r,
         CAST(MAX(ss) AS DOUBLE) / CAST(w AS DOUBLE)
           - (CAST(MAX(s) AS DOUBLE) / CAST(w AS DOUBLE))
             * (CAST(MAX(s) AS DOUBLE) / CAST(w AS DOUBLE)) AS var
  FROM dev GROUP BY w, wid
),
valid AS (
  SELECT w, wid, r / sqrt(var) AS rs FROM winstat WHERE var > 0
),
per_w AS (
  SELECT w, COUNT(*) AS n_windows,
         ROUND(list_sum(list(rs ORDER BY wid)) / CAST(COUNT(*) AS DOUBLE), 6)
           AS avg_rs
  FROM valid GROUP BY w
),
pts AS (
  SELECT w, n_windows, avg_rs,
         ln(CAST(w AS DOUBLE)) AS x, ln(avg_rs) AS y
  FROM per_w
),
m1 AS (
  SELECT list_sum(list(x ORDER BY w)) / CAST(COUNT(*) AS DOUBLE) AS xbar,
         list_sum(list(y ORDER BY w)) / CAST(COUNT(*) AS DOUBLE) AS ybar
  FROM pts
),
m2 AS (
  SELECT list_sum(list((p.x - m1.xbar) * (p.y - m1.ybar) ORDER BY p.w)) AS sxy,
         list_sum(list((p.x - m1.xbar) * (p.x - m1.xbar) ORDER BY p.w)) AS sxx
  FROM pts p, m1
)
SELECT CAST(p.w AS BIGINT) AS window_h,
       CAST(p.n_windows AS BIGINT) AS n_windows,
       p.avg_rs,
       ROUND(m2.sxy / m2.sxx, 6) AS hurst
FROM pts p, m2
"""


QUERIES14["turning_points"] = q_turning_points
QUERIES14["runs_test"] = q_runs_test
QUERIES14["allan_variance"] = q_allan_variance
QUERIES14["hurst_rs"] = q_hurst_rs
