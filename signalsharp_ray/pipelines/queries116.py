"""Round-4 batch 116: correlation / funnel / robust-stats operators —
the lagged cross-correlation function between two event types' hourly
series, a view->purchase conversion funnel with a 1-hour attribution
window, and the exact rank-trimmed (5%) mean of event values per type.

House parity: hourly counts and CCF moments are exact int64 sums, so
each r(k) is one float expression on both sides; the funnel counts are
integers; the trimmed mean trims by RANK over exact centivalues (k =
n // 20 from each end) so the result is a ratio of two exact integers.

Scale contracts: the hourly grid is bounded by the stream's time span
(not its row count), so the driver-side combine over the per-hour
aggregate is O(hours); the funnel and the trim reduce per user / per
type inside bucketed exchanges (searchsorted view->purchase match and
an O(n log n) per-group sort — no per-row Python loops)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away

QUERIES116: dict = {}
ORACLES116: dict = {}

HOUR_US = 3_600_000_000


def _hourly_counts(sf_dir: str, event_type: str | None = None) -> pd.DataFrame:
    """(hour_index, n) exact integer hourly counts via one bucketed
    exchange; hour_index = epoch_us // HOUR_US."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if event_type is not None:
            batch = batch[batch["event_type"] == event_type]
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        return (
            pd.DataFrame(
                {
                    "h": (us // HOUR_US).astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                }
            )
            .groupby("h", sort=False)
            .sum()
            .reset_index()
        )

    cols = ["ts"] if event_type is None else ["ts", "event_type"]
    return (
        hash_bucket_aggregate(
            _events(sf_dir, cols).map_batches(partial, batch_format="pandas"),
            ["h"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values("h")
        .reset_index(drop=True)
    )


def _dense(counts: pd.DataFrame) -> tuple[np.ndarray, np.ndarray]:
    """Dense (hour_index, count) grid over [min, max] with zero fill."""
    h = counts["h"].to_numpy(np.int64)
    n = counts["n_sum"].to_numpy(np.int64)
    grid = np.arange(h.min(), h.max() + 1, dtype=np.int64)
    x = np.zeros(len(grid), dtype=np.int64)
    x[h - h.min()] = n
    return grid, x


# ---------------------------------------------------------------------------
# Exact rank-trimmed mean of event values per type
# ---------------------------------------------------------------------------


def q_trimmed_mean_by_type(sf_dir: str, trim: int = 20):
    """Per event_type: n, the 5%-trimmed mean (k = n // 20 rows trimmed
    from EACH end by rank over exact centivalues, ties broken by
    event_id so the trim set is deterministic), and the plain mean —
    both ratios of exact integer sums."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64) * 100
        return pd.DataFrame(
            {
                "event_type": batch["event_type"].astype(str),
                "event_id": batch["event_id"].astype(np.int64),
                "cents": (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(
                    np.int64
                ),
            }
        )

    ev = _events(sf_dir, ["event_type", "event_id", "value"]).map_batches(
        project, batch_format="pandas"
    )

    def per_type(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cents", "event_id"])
        c = g["cents"].to_numpy(np.int64)
        n = len(c)
        k = n // trim
        total = int(c.sum())
        kept = int(c[k: n - k].sum()) if n - 2 * k > 0 else 0
        return pd.DataFrame(
            {
                "event_type": [str(g["event_type"].iloc[0])],
                "n_events": np.array([n], dtype=np.int64),
                "trimmed_mean": [
                    float(_r6away(kept / (100.0 * (n - 2 * k))))
                    if n - 2 * k > 0
                    else 0.0
                ],
                "mean_value": [float(_r6away(total / (100.0 * n)))],
            }
        )

    return bucketed_map_groups(ev, ["event_type"], per_type)


ORACLES116["trimmed_mean_by_type"] = """
WITH c AS (
  SELECT event_type, event_id,
         CAST(ROUND(value * 100) AS BIGINT) AS cents,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(ROUND(value * 100) AS BIGINT),
                                     event_id) AS rk,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(cents) FILTER (
               WHERE rk > n // 20 AND rk <= n - n // 20
             ) AS DOUBLE)
             / (100.0 * (MAX(n) - 2 * (MAX(n) // 20))), 6)
         AS trimmed_mean,
       ROUND(CAST(SUM(cents) AS DOUBLE) / (100.0 * MAX(n)), 6)
         AS mean_value
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Lagged cross-correlation between two event types' hourly series
# ---------------------------------------------------------------------------


def q_type_hourly_ccf(sf_dir: str, lags: int = 3):
    """Pearson cross-correlation r(k) between the 'view' and 'purchase'
    hourly count series for lags k in [-3, 3]: pairs (a_t, b_{t+k}) over
    the shared dense grid. All moment sums are exact int64."""
    ga, a = _dense(_hourly_counts(sf_dir, "view"))
    gb, b = _dense(_hourly_counts(sf_dir, "purchase"))
    lo = min(ga[0], gb[0])
    hi = max(ga[-1], gb[-1])
    grid = np.arange(lo, hi + 1, dtype=np.int64)
    av = np.zeros(len(grid), dtype=np.int64)
    bv = np.zeros(len(grid), dtype=np.int64)
    av[ga - lo] = a
    bv[gb - lo] = b
    rows = []
    for k in range(-lags, lags + 1):
        if k >= 0:
            aa, bb = av[: len(av) - k or None], bv[k:]
        else:
            aa, bb = av[-k:], bv[:k]
        n = len(aa)
        sa, sb = int(aa.sum()), int(bb.sum())
        saa = int((aa * aa).sum())
        sbb = int((bb * bb).sum())
        sab = int((aa * bb).sum())
        da = float(n * saa - sa * sa)
        db = float(n * sbb - sb * sb)
        if n < 2 or da <= 0.0 or db <= 0.0:
            continue
        r = float(n * sab - sa * sb) / (math.sqrt(da) * math.sqrt(db))
        rows.append((int(k), np.int64(n), float(_r6away(r))))
    return pd.DataFrame(rows, columns=["lag", "n_hours", "r"]).astype(
        {"lag": np.int64, "n_hours": np.int64}
    )


ORACLES116["type_hourly_ccf"] = """
WITH b AS (
  SELECT epoch_us(ts) // 3600000000 AS h, event_type, COUNT(*) AS n
  FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1, 2
),
grid AS (
  SELECT UNNEST(generate_series((SELECT MIN(h) FROM b),
                                (SELECT MAX(h) FROM b))) AS h
),
dense AS (
  SELECT grid.h,
         COALESCE(MAX(CASE WHEN b.event_type = 'view' THEN b.n END), 0)
           AS a,
         COALESCE(MAX(CASE WHEN b.event_type = 'purchase' THEN b.n END), 0)
           AS bb
  FROM grid LEFT JOIN b USING (h) GROUP BY grid.h
),
lagk AS (SELECT UNNEST(generate_series(-3, 3)) AS k),
pairs AS (
  SELECT lagk.k, d1.a AS a, d2.bb AS b
  FROM lagk
  JOIN dense d1 ON TRUE
  JOIN dense d2 ON d2.h = d1.h + lagk.k
),
m AS (
  SELECT k, COUNT(*) AS n,
         CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
         CAST(SUM(a * a) AS BIGINT) AS saa,
         CAST(SUM(b * b) AS BIGINT) AS sbb,
         CAST(SUM(a * b) AS BIGINT) AS sab
  FROM pairs GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS lag, CAST(n AS BIGINT) AS n_hours,
       ROUND(CAST(n * sab - sa * sb AS DOUBLE)
             / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                * sqrt(CAST(n * sbb - sb * sb AS DOUBLE))), 6) AS r
FROM m
WHERE n >= 2 AND n * saa - sa * sa > 0 AND n * sbb - sb * sb > 0
ORDER BY lag
"""


# ---------------------------------------------------------------------------
# View -> purchase conversion funnel with a 1-hour attribution window
# ---------------------------------------------------------------------------


def q_funnel_view_purchase_1h(sf_dir: str):
    """One global row: users with >= 1 view, those with a purchase
    within [view_ts, view_ts + 1h] of ANY of their views, and the
    conversion rate. Per-user match is a vectorized searchsorted of each
    purchase against the sorted view times."""

    def project(batch: pd.DataFrame) -> pd.DataFrame:
        m = batch["event_type"].isin(["view", "purchase"])
        b = batch[m]
        return pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "is_view": (b["event_type"] == "view").to_numpy(),
                "us": b["ts"].astype("datetime64[us]").astype("int64"),
            }
        )

    ev = _events(sf_dir, ["user_id", "event_type", "ts"]).map_batches(
        project, batch_format="pandas"
    )

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        views = np.sort(g.loc[g["is_view"], "us"].to_numpy(np.int64))
        if len(views) == 0:
            return pd.DataFrame(
                {"viewers": pd.Series([0], dtype=np.int64),
                 "converted": pd.Series([0], dtype=np.int64)}
            )
        buys = g.loc[~g["is_view"], "us"].to_numpy(np.int64)
        conv = 0
        if len(buys):
            idx = np.searchsorted(views, buys, side="right") - 1
            ok = idx >= 0
            if ok.any():
                conv = int(
                    ((buys[ok] - views[idx[ok]]) <= HOUR_US).any()
                )
        return pd.DataFrame(
            {"viewers": pd.Series([1], dtype=np.int64),
             "converted": pd.Series([conv], dtype=np.int64)}
        )

    parts = bucketed_map_groups(ev, ["user_id"], per_user).to_pandas()
    nv = int(parts["viewers"].sum())
    nc = int(parts["converted"].sum())
    if nv == 0:
        return pd.DataFrame(
            {
                "n_view_users": pd.Series(dtype=np.int64),
                "n_converted": pd.Series(dtype=np.int64),
                "conversion_rate": pd.Series(dtype=np.float64),
            }
        )
    return pd.DataFrame(
        {
            "n_view_users": np.array([nv], dtype=np.int64),
            "n_converted": np.array([nc], dtype=np.int64),
            "conversion_rate": [float(_r6away(float(nc) / float(nv)))],
        }
    )


ORACLES116["funnel_view_purchase_1h"] = """
WITH vu AS (
  SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
),
conv AS (
  SELECT DISTINCT v.user_id
  FROM events v
  JOIN events p
    ON p.user_id = v.user_id
   AND v.event_type = 'view' AND p.event_type = 'purchase'
   AND p.ts >= v.ts AND p.ts <= v.ts + INTERVAL 1 HOUR
),
c AS (SELECT COUNT(*) AS nc FROM conv),
n AS (SELECT COUNT(*) AS nv FROM vu)
SELECT CAST(n.nv AS BIGINT) AS n_view_users,
       CAST(c.nc AS BIGINT) AS n_converted,
       ROUND(CAST(c.nc AS DOUBLE) / CAST(n.nv AS DOUBLE), 6)
         AS conversion_rate
FROM n, c
"""


QUERIES116["trimmed_mean_by_type"] = q_trimmed_mean_by_type
QUERIES116["type_hourly_ccf"] = q_type_hourly_ccf
QUERIES116["funnel_view_purchase_1h"] = q_funnel_view_purchase_1h
