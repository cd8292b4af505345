"""Round-4 batch 123: the PromQL recording-rule family — Prometheus
histogram_quantile over fixed-le bucket counters (the p90 every latency
SLO is defined on), predict_linear over the trailing 72 dense hours (the
capacity-runway extrapolation), week-over-week daily load comparison
(the seasonal drift monitor), and the seasonal-naive vs naive forecast
error ratio (the MASE-flavoured screen for "is there actually a daily
cycle worth modelling").

House parity: histogram bucket membership compares raw parquet doubles
identically on both engines; the p90 bucket SELECTION is the integer
cross-multiplication 10*cum >= 9*n and only the final interpolation is
float (transcribed op-for-op, rank = 0.9*n as a shared double product);
predict_linear's moment sums are exact int64/HUGEINT with slope /
intercept / prediction each one transcribed expression; WoW and
forecast-error tables are exact integer counts and absolute differences
with a single shared division per row.

Scale contracts: bucket counters, WoW pairs and error sums pre-reduce
inside map_batches and exchange bounded keys (type x hour x 5 buckets,
type x day); the dense-grid folds run over retention-bounded profiles
on the driver, never the event table."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries6 import HOUR_US, _hourly_counts
from .queries8 import _dense_by_type
from .queries120 import _daily_counts

QUERIES123: dict = {}
ORACLES123: dict = {}

DAY_US = 86_400_000_000
HQ_BOUNDS = (50.0, 100.0, 200.0, 400.0)  # finite le bounds; bucket 4 = +Inf
PL_WINDOW = 72  # trailing hours for predict_linear
PL_AHEAD = 24  # predict this many hours past the last grid hour


# ---------------------------------------------------------------------------
# Prometheus histogram_quantile (p90) over le-bucketed counters
# ---------------------------------------------------------------------------


def q_histogram_quantile(sf_dir: str):
    """Per (event_type, hour): the PromQL
    histogram_quantile(0.9, ...) estimate over cumulative buckets with
    le in {50, 100, 200, 400, +Inf} on `value`. The target bucket is the
    FIRST observed bucket whose cumulative count clears the exact
    integer predicate 10*cum >= 9*n; the estimate linearly interpolates
    lower + (upper - lower) * (0.9*n - cum_below)/bucket_count, and the
    +Inf bucket returns the highest finite bound (Prometheus
    behavior)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hour = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
        ) * HOUR_US
        v = batch["value"].to_numpy(np.float64)
        bucket = np.full(len(batch), 4, dtype=np.int64)
        bucket[v <= HQ_BOUNDS[3]] = 3
        bucket[v <= HQ_BOUNDS[2]] = 2
        bucket[v <= HQ_BOUNDS[1]] = 1
        bucket[v <= HQ_BOUNDS[0]] = 0
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "hour_us": hour,
                    "bucket": bucket,
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["event_type", "hour_us", "bucket"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type", "hour_us", "bucket"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["event_type", "hour_us", "bucket"])
    )
    rows = []
    for (et, hr), g in agg.groupby(["event_type", "hour_us"], sort=True):
        b = g["bucket"].to_numpy(np.int64)
        c = g["n_sum"].to_numpy(np.int64)
        cum = np.cumsum(c)
        n = int(cum[-1])
        sel = None
        for i in range(len(b)):
            if 10 * int(cum[i]) >= 9 * n:
                sel = i
                break
        bi = int(b[sel])
        if bi == 4:
            est = HQ_BOUNDS[3]
        else:
            lower = 0.0 if bi == 0 else HQ_BOUNDS[bi - 1]
            upper = HQ_BOUNDS[bi]
            cum_below = int(cum[sel]) - int(c[sel])
            rank = 0.9 * float(n)
            est = lower + (upper - lower) * (rank - float(cum_below)) / float(
                c[sel]
            )
        rows.append((et, int(hr), n, float(_r6away(est))))
    out = pd.DataFrame(
        rows, columns=["event_type", "hour_us", "n_events", "p90_est"]
    )
    out["hour"] = out["hour_us"].astype("datetime64[us]")
    return out.drop(columns=["hour_us"]).astype({"n_events": np.int64})


ORACLES123["histogram_quantile"] = f"""
WITH b AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CASE WHEN value <= {HQ_BOUNDS[0]} THEN 0
              WHEN value <= {HQ_BOUNDS[1]} THEN 1
              WHEN value <= {HQ_BOUNDS[2]} THEN 2
              WHEN value <= {HQ_BOUNDS[3]} THEN 3
              ELSE 4 END AS bucket
  FROM events
),
g AS (
  SELECT event_type, hour, bucket, COUNT(*) AS c FROM b GROUP BY 1, 2, 3
),
w AS (
  SELECT event_type, hour, bucket, c,
         SUM(c) OVER (PARTITION BY event_type, hour ORDER BY bucket) AS cum,
         SUM(c) OVER (PARTITION BY event_type, hour) AS n
  FROM g
),
sel AS (
  SELECT event_type, hour, bucket, c, cum, n
  FROM w
  WHERE 10 * cum >= 9 * n
  QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type, hour
                             ORDER BY bucket) = 1
)
SELECT event_type, hour, CAST(n AS BIGINT) AS n_events,
       ROUND(CASE WHEN bucket = 4 THEN CAST({HQ_BOUNDS[3]} AS DOUBLE)
             ELSE (CASE WHEN bucket = 0 THEN CAST(0.0 AS DOUBLE)
                        WHEN bucket = 1 THEN CAST({HQ_BOUNDS[0]} AS DOUBLE)
                        WHEN bucket = 2 THEN CAST({HQ_BOUNDS[1]} AS DOUBLE)
                        ELSE CAST({HQ_BOUNDS[2]} AS DOUBLE) END)
                  + (CASE WHEN bucket = 0 THEN CAST({HQ_BOUNDS[0]} AS DOUBLE)
                          WHEN bucket = 1
                            THEN CAST({HQ_BOUNDS[1]} AS DOUBLE)
                              - CAST({HQ_BOUNDS[0]} AS DOUBLE)
                          WHEN bucket = 2
                            THEN CAST({HQ_BOUNDS[2]} AS DOUBLE)
                              - CAST({HQ_BOUNDS[1]} AS DOUBLE)
                          ELSE CAST({HQ_BOUNDS[3]} AS DOUBLE)
                              - CAST({HQ_BOUNDS[2]} AS DOUBLE) END)
                    * (CAST(0.9 AS DOUBLE) * CAST(n AS DOUBLE)
                       - CAST(cum - c AS DOUBLE))
                    / CAST(c AS DOUBLE)
             END, 6) AS p90_est
FROM sel
"""


# ---------------------------------------------------------------------------
# predict_linear over the trailing dense window
# ---------------------------------------------------------------------------


def q_predict_linear(sf_dir: str):
    """PromQL predict_linear per event type: OLS over the LAST 72 hours
    of the zero-filled dense hourly count series (re-indexed i = 0..71),
    extrapolated 24 hours past the last grid hour — the capacity-runway
    number. Moment sums S1, S2, Sy, Siy are exact integers; slope,
    intercept and the prediction are three transcribed float
    expressions. Types are skipped only if the grid itself is shorter
    than 2 hours."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n_grid = int(grid.size)
    w = min(PL_WINDOW, n_grid)
    if w < 2:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_window": pd.Series([], dtype=np.int64),
                "slope": pd.Series([], dtype=np.float64),
                "predicted": pd.Series([], dtype=np.float64),
            }
        )
    rows = []
    s1 = w * (w - 1) // 2
    s2 = (w - 1) * w * (2 * w - 1) // 6
    for ti, t in enumerate(types):
        y = mat[ti, n_grid - w :]
        sy = int(y.sum())
        siy = int((np.arange(w, dtype=np.int64) * y).sum())
        denom = w * s2 - s1 * s1
        slope = (float(w) * float(siy) - float(s1) * float(sy)) / float(denom)
        intercept = (float(sy) - slope * float(s1)) / float(w)
        pred = intercept + slope * float(w - 1 + PL_AHEAD)
        rows.append(
            (t, w, float(_r6away(slope)), float(_r6away(pred)))
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_window", "slope", "predicted"]
    ).astype({"n_window": np.int64})


ORACLES123["predict_linear"] = f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
types AS (SELECT DISTINCT event_type FROM h),
dense AS (
  SELECT t.event_type, g.bh,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
params AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
         CAST(least({PL_WINDOW}, COUNT(*)) AS BIGINT) AS w
  FROM grid
),
win AS (
  SELECT d.event_type, d.idx - (p.n_grid - p.w) AS i, d.x, p.w
  FROM dense d CROSS JOIN params p
  WHERE d.idx >= p.n_grid - p.w
),
m AS (
  SELECT event_type, MAX(w) AS w,
         CAST(SUM(i) AS BIGINT) AS s1,
         CAST(SUM(i * i) AS BIGINT) AS s2,
         CAST(SUM(x) AS BIGINT) AS sy,
         CAST(SUM(i * x) AS BIGINT) AS siy
  FROM win GROUP BY 1
),
f AS (
  SELECT event_type, w, s1, sy,
         (CAST(w AS DOUBLE) * CAST(siy AS DOUBLE)
          - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE))
         / CAST(w * s2 - s1 * s1 AS DOUBLE) AS slope
  FROM m WHERE w >= 2
)
SELECT f.event_type, f.w AS n_window, ROUND(f.slope, 6) AS slope,
       ROUND((CAST(f.sy AS DOUBLE) - f.slope * CAST(f.s1 AS DOUBLE))
               / CAST(f.w AS DOUBLE)
             + f.slope * CAST(f.w - 1 + {PL_AHEAD} AS DOUBLE), 6) AS predicted
FROM f
"""


# ---------------------------------------------------------------------------
# Week-over-week daily load comparison
# ---------------------------------------------------------------------------


def q_week_over_week_daily(sf_dir: str):
    """Per (event_type, dense-grid day with a full week behind it): the
    day's event count vs the same weekday one week earlier, the integer
    difference, and the WoW ratio (rows with a zero prior week are
    excluded on both sides — the predicate is integer)."""
    agg = _daily_counts(sf_dir)
    lo = int(agg["day_us"].min())
    hi = int(agg["day_us"].max())
    grid = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    n_days = int(grid.size)
    rows = []
    for t in sorted(agg["event_type"].unique()):
        g = agg[agg["event_type"] == t]
        v = np.zeros(n_days, dtype=np.int64)
        v[(g["day_us"].to_numpy(np.int64) - lo) // DAY_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
        for d in range(7, n_days):
            prev = int(v[d - 7])
            if prev == 0:
                continue
            cur = int(v[d])
            rows.append(
                (
                    t,
                    int(grid[d]),
                    cur,
                    prev,
                    cur - prev,
                    float(_r6away(float(cur) / float(prev))),
                )
            )
    out = pd.DataFrame(
        rows,
        columns=[
            "event_type",
            "day_us",
            "n_today",
            "n_lastweek",
            "wow_diff",
            "wow_ratio",
        ],
    )
    if len(out) == 0:
        out = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "day_us": pd.Series([], dtype=np.int64),
                "n_today": pd.Series([], dtype=np.int64),
                "n_lastweek": pd.Series([], dtype=np.int64),
                "wow_diff": pd.Series([], dtype=np.int64),
                "wow_ratio": pd.Series([], dtype=np.float64),
            }
        )
    out["day"] = out["day_us"].astype("datetime64[us]")
    return out.drop(columns=["day_us"]).astype(
        {"n_today": np.int64, "n_lastweek": np.int64, "wow_diff": np.int64}
    )


ORACLES123["week_over_week_daily"] = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS bd, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bd) AS lo, MAX(bd) AS hi FROM d),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bd FROM bounds
),
types AS (SELECT DISTINCT event_type FROM d),
dense AS (
  SELECT t.event_type, g.bd,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bd) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(d.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN d ON d.event_type = t.event_type AND d.bd = g.bd
)
SELECT a.event_type, a.bd AS day,
       a.x AS n_today, b.x AS n_lastweek,
       a.x - b.x AS wow_diff,
       ROUND(CAST(a.x AS DOUBLE) / CAST(b.x AS DOUBLE), 6) AS wow_ratio
FROM dense a
JOIN dense b ON b.event_type = a.event_type AND b.idx = a.idx - 7
WHERE b.x > 0
"""


# ---------------------------------------------------------------------------
# Seasonal-naive vs naive forecast error
# ---------------------------------------------------------------------------


def q_seasonal_naive_error(sf_dir: str):
    """Per event type over the dense hourly grid: the sum of absolute
    errors of the seasonal-naive forecast (y_hat_t = y_{t-24}) and of
    the plain naive forecast (y_hat_t = y_{t-1}), both over hours
    t >= 24, plus their ratio — a MASE-flavoured screen: ratio < 1 means
    the daily cycle genuinely predicts. Both error sums are exact
    integers; the ratio is one shared division (types with a zero naive
    error are excluded on both sides)."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    if n < 25:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_hours": pd.Series([], dtype=np.int64),
                "sae_seasonal": pd.Series([], dtype=np.int64),
                "sae_naive": pd.Series([], dtype=np.int64),
                "error_ratio": pd.Series([], dtype=np.float64),
            }
        )
    rows = []
    for ti, t in enumerate(types):
        v = mat[ti]
        sae_s = int(np.abs(v[24:] - v[:-24]).sum())
        sae_n = int(np.abs(v[24:] - v[23:-1]).sum())
        if sae_n == 0:
            continue
        rows.append(
            (
                t,
                n - 24,
                sae_s,
                sae_n,
                float(_r6away(float(sae_s) / float(sae_n))),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "event_type",
            "n_hours",
            "sae_seasonal",
            "sae_naive",
            "error_ratio",
        ],
    ).astype(
        {"n_hours": np.int64, "sae_seasonal": np.int64, "sae_naive": np.int64}
    )


ORACLES123["seasonal_naive_error"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
types AS (SELECT DISTINCT event_type FROM h),
dense AS (
  SELECT t.event_type, g.bh,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
e AS (
  SELECT a.event_type,
         COUNT(*) AS n_hours,
         CAST(SUM(abs(a.x - s.x)) AS BIGINT) AS sae_seasonal,
         CAST(SUM(abs(a.x - p.x)) AS BIGINT) AS sae_naive
  FROM dense a
  JOIN dense s ON s.event_type = a.event_type AND s.idx = a.idx - 24
  JOIN dense p ON p.event_type = a.event_type AND p.idx = a.idx - 1
  GROUP BY 1
)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours, sae_seasonal,
       sae_naive,
       ROUND(CAST(sae_seasonal AS DOUBLE) / CAST(sae_naive AS DOUBLE), 6)
         AS error_ratio
FROM e WHERE sae_naive > 0
"""


QUERIES123["histogram_quantile"] = q_histogram_quantile
QUERIES123["predict_linear"] = q_predict_linear
QUERIES123["week_over_week_daily"] = q_week_over_week_daily
QUERIES123["seasonal_naive_error"] = q_seasonal_naive_error
