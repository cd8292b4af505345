"""Round-3 batch 48: stream-memory and audience-stability diagnostics —
lag-1 autocorrelation of consecutive event VALUES per type (do big
transactions follow big transactions in stream order — the value twin
of gap_autocorr), and DAU stability per type (coefficient of variation
of daily distinct users — a spiky audience needs different capacity
than a steady one).

House parity: value pairs form in (ts, event_id) order with exact
centivalue power sums (Python ints / HUGEINTs) feeding the transcribed
Pearson; daily distinct users dedup inside the exchange and the CV is
one transcribed expression over exact integer sums.

Scale contracts: per-type kernels run inside hash buckets; the
(type, day) distinct table is catalog x retention bounded.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents

QUERIES46: dict = {}
ORACLES46: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Lag-1 value autocorrelation per type
# ---------------------------------------------------------------------------


def q_value_autocorr(sf_dir: str):
    """Per event type: Pearson correlation between consecutive event
    values in (ts, event_id) stream order — positive means stake sizes
    cluster in time. All power sums are exact Python ints over
    centivalues; one transcribed expression; degenerate types excluded
    identically."""
    ev = _events(sf_dir, ["event_id", "ts", "event_type", "value"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "ts_us": batch["ts"].to_numpy("datetime64[us]").view(np.int64),
                "event_id": batch["event_id"].astype(np.int64),
                "c": _cents(batch["value"]),
            }
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts_us", "event_id"])
        c = df["c"].to_numpy(np.int64)
        if c.size < 3:
            return _VA_EMPTY.copy()
        x = c[:-1]
        y = c[1:]
        n = int(x.size)
        sx = int(x.sum())
        sy = int(y.sum())
        sxx = sum(int(v) * int(v) for v in x)
        syy = sum(int(v) * int(v) for v in y)
        sxy = sum(int(a) * int(b) for a, b in zip(x, y))
        num = float(n) * float(sxy) - float(sx) * float(sy)
        dx = float(n) * float(sxx) - float(sx) * float(sx)
        dy = float(n) * float(syy) - float(sy) * float(sy)
        if not (dx > 0.0 and dy > 0.0):
            return _VA_EMPTY.copy()
        r = num / (math.sqrt(dx) * math.sqrt(dy))
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_pairs": np.array([n], dtype=np.int64),
                "value_autocorr": [float(_r6away(r))],
            }
        )

    return bucketed_map_groups(
        ev.map_batches(prep, batch_format="pandas"), ["event_type"], kernel
    )


_VA_EMPTY = pd.DataFrame(
    {
        "event_type": pd.Series(dtype=object),
        "n_pairs": pd.Series(dtype=np.int64),
        "value_autocorr": pd.Series(dtype=np.float64),
    }
)


ORACLES46["value_autocorr"] = """
WITH s AS (
  SELECT event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS c,
         LEAD(CAST(ROUND(value * 100) AS BIGINT))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS nxt
  FROM events
),
p AS (SELECT event_type, c AS x, nxt AS y FROM s WHERE nxt IS NOT NULL),
a AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(x::HUGEINT * x::HUGEINT) AS sxx,
         SUM(y::HUGEINT * y::HUGEINT) AS syy,
         SUM(x::HUGEINT * y::HUGEINT) AS sxy
  FROM p GROUP BY 1 HAVING COUNT(*) >= 2
),
d AS (
  SELECT event_type, n,
         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
         CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) AS dx,
         CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) AS dy
  FROM a
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_pairs,
       ROUND(num / (sqrt(dx) * sqrt(dy)), 6) AS value_autocorr
FROM d WHERE dx > 0.0 AND dy > 0.0
"""


# ---------------------------------------------------------------------------
# DAU stability per type
# ---------------------------------------------------------------------------


def q_dau_stability(sf_dir: str):
    """Per event type: mean daily distinct users and the coefficient
    of variation across days — audience steadiness
    (distinct_daily_users counts; this scores the stability). Distinct
    (type, day, user) triples dedup inside one exchange; CV combines
    exact integer sums; single-day types excluded identically."""
    ev = _events(sf_dir, ["ts", "event_type", "user_id"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
                "user_id": b["user_id"].astype(np.int64),
            }
        )
        .drop_duplicates()
        .assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
        batch_format="pandas",
    )
    triples = hash_bucket_aggregate(
        ev, ["event_type", "day_us", "user_id"], [("one", "max")]
    )
    per_day = hash_bucket_aggregate(
        triples.map_batches(
            lambda b: pd.DataFrame(
                {
                    "event_type": b["event_type"],
                    "day_us": b["day_us"].astype(np.int64),
                    "u": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["event_type", "day_us"],
        [("u", "sum")],
    ).to_pandas()
    rows = []
    for t, g in per_day.groupby("event_type", sort=True):
        v = g["u_sum"].to_numpy(np.int64)
        n = int(v.size)
        if n < 2:
            continue
        s = int(v.sum())
        ss = int((v * v).sum())
        nf = float(n)
        mu = float(s) / nf
        var = float(ss) / nf - mu * mu
        cv = math.sqrt(var if var > 0.0 else 0.0) / mu
        rows.append((t, n, float(_r6away(mu)), float(_r6away(cv))))
    return pd.DataFrame(
        rows, columns=["event_type", "n_days", "mean_dau", "cv_dau"]
    ).astype({"n_days": np.int64})


ORACLES46["dau_stability"] = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         COUNT(DISTINCT user_id) AS u
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(u) AS BIGINT) AS s,
         CAST(SUM(u::HUGEINT * u::HUGEINT) AS BIGINT) AS ss
  FROM d GROUP BY 1 HAVING COUNT(*) >= 2
),
m AS (
  SELECT event_type, n, ss,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var
  FROM a
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       ROUND(mu, 6) AS mean_dau,
       ROUND(sqrt(GREATEST(var, CAST(0.0 AS DOUBLE))) / mu, 6) AS cv_dau
FROM m
"""


QUERIES46["value_autocorr"] = q_value_autocorr
QUERIES46["dau_stability"] = q_dau_stability
