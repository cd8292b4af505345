"""Round-3 batch 108: phase-alignment, demographic-mix, and range
operators — each type's peak hour-of-day and its circular offset from
the global peak (are behaviours phase-shifted), the chi-square
independence of (market segment, nation) over customers, and the mean
daily value range per type (intraday spread of the metric).

House parity: peak selection is integer (count DESC, hod ASC); the
circular offset is pure integer arithmetic; chi2 margins are exact
with the standard fold; daily ranges are exact centivalue max-min
integers with one mean division.

Scale contracts: all three are bounded partial+final aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries14 import _fold
from .queries16 import _read

QUERIES106: dict = {}
ORACLES106: dict = {}

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Peak-hour offset per type
# ---------------------------------------------------------------------------


def q_peak_hour_offset_by_type(sf_dir: str):
    """Per event_type: its peak hour-of-day (count DESC, hod ASC), the
    global peak hour, and the circular offset (t - g + 24) % 24."""
    ev = _events(sf_dir, ["event_type", "ts"]).map_batches(
        lambda b: (
            lambda us: pd.DataFrame(
                {
                    "event_type": b["event_type"],
                    "hod": ((us // HOUR_US) % 24).astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                }
            )
        )(b["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        .groupby(["event_type", "hod"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        ev, ["event_type", "hod"], [("n", "sum")]
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"event_type": pd.Series(dtype=object),
         "peak_hod": pd.Series(dtype=np.int64),
         "global_peak_hod": pd.Series(dtype=np.int64),
         "offset_hours": pd.Series(dtype=np.int64)}
    )
    if agg.empty:
        return out_empty
    g_tot = agg.groupby("hod")["n_sum"].sum().astype(np.int64)
    g_best = -1
    g_n = -1
    for h in sorted(g_tot.index):
        if int(g_tot.loc[h]) > g_n:
            g_n = int(g_tot.loc[h])
            g_best = int(h)
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        g = g.sort_values(["n_sum", "hod"], ascending=[False, True])
        t = int(g["hod"].iloc[0])
        rows.append((et, t, g_best, (t - g_best + 24) % 24))
    return pd.DataFrame(
        rows,
        columns=["event_type", "peak_hod", "global_peak_hod",
                 "offset_hours"],
    ).astype({"peak_hod": np.int64, "global_peak_hod": np.int64,
              "offset_hours": np.int64})


ORACLES106["peak_hour_offset_by_type"] = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tp AS (
  SELECT event_type, hod AS peak FROM c
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY n DESC, hod ASC) = 1
),
gt AS (SELECT hod, SUM(n) AS n FROM c GROUP BY 1),
gp AS (
  SELECT hod AS gpeak FROM gt
  QUALIFY row_number() OVER (ORDER BY n DESC, hod ASC) = 1
)
SELECT tp.event_type,
       CAST(tp.peak AS BIGINT) AS peak_hod,
       CAST(gp.gpeak AS BIGINT) AS global_peak_hod,
       CAST((tp.peak - gp.gpeak + 24) % 24 AS BIGINT) AS offset_hours
FROM tp, gp
"""


# ---------------------------------------------------------------------------
# Segment x nation chi-square
# ---------------------------------------------------------------------------


def q_segment_nation_chi2(sf_dir: str):
    """One global row: chi-square independence of (c_mktsegment,
    c_nationkey) over customers — is the segment mix geographic."""
    cust = _read(sf_dir, "customer", ["c_mktsegment", "c_nationkey"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "segment": batch["c_mktsegment"],
                    "nation": batch["c_nationkey"].astype(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["segment", "nation"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            cust.map_batches(partial, batch_format="pandas"),
            ["segment", "nation"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["segment", "nation"])
    )
    out_empty = pd.DataFrame(
        {"n_customers": pd.Series(dtype=np.int64),
         "dof": pd.Series(dtype=np.int64),
         "chi2": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    total = int(agg["n_sum"].sum())
    row = agg.groupby("segment")["n_sum"].transform("sum").astype(np.int64)
    col_map = agg.groupby("nation")["n_sum"].sum().astype(np.int64)
    col = agg["nation"].map(col_map).astype(np.int64)
    tf = float(total)
    terms = []
    for o, rx, cy in zip(agg["n_sum"], row, col):
        e = float(int(rx)) * float(int(cy)) / tf
        terms.append((float(int(o)) - e) * (float(int(o)) - e) / e)
    chi2 = _fold(terms)
    nr = int(agg["segment"].nunique())
    nc = int(agg["nation"].nunique())
    return pd.DataFrame(
        {
            "n_customers": np.array([total], dtype=np.int64),
            "dof": np.array([(nr - 1) * (nc - 1)], dtype=np.int64),
            "chi2": [float(_r6away(chi2))],
        }
    )


ORACLES106["segment_nation_chi2"] = """
WITH c AS (
  SELECT c_mktsegment AS segment, c_nationkey AS nation, COUNT(*) AS n
  FROM customer GROUP BY 1, 2
),
w AS (
  SELECT segment, nation, n,
         CAST(SUM(n) OVER (PARTITION BY segment) AS BIGINT) AS r,
         CAST(SUM(n) OVER (PARTITION BY nation) AS BIGINT) AS cl,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM c
)
SELECT CAST(MAX(total) AS BIGINT) AS n_customers,
       CAST((COUNT(DISTINCT segment) - 1) * (COUNT(DISTINCT nation) - 1)
            AS BIGINT) AS dof,
       ROUND(list_sum(list(
         (CAST(n AS DOUBLE)
          - CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         * (CAST(n AS DOUBLE)
            - CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         / (CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         ORDER BY segment, nation)), 6) AS chi2
FROM w
"""


# ---------------------------------------------------------------------------
# Mean daily value range per type
# ---------------------------------------------------------------------------


def q_daily_value_range_mean(sf_dir: str):
    """Per event_type: the mean over calendar days of the intraday
    centivalue range (max - min)/100 — the metric's daily spread."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        c = _cents(batch["value"])
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "day": (us // DAY_US).astype(np.int64),
                "lo": c,
                "hi": c,
            }
        )
        return (
            df.groupby(["event_type", "day"], sort=False)
            .agg(lo=("lo", "min"), hi=("hi", "max"))
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type", "day"],
            [("lo", "min"), ("hi", "max")],
        )
        .to_pandas()
        .sort_values(["event_type", "day"])
    )
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        n = len(g)
        ranges = [
            float(int(h) - int(l))
            for l, h in zip(g["lo_min"], g["hi_max"])
        ]
        rows.append(
            (et, n, float(_r6away(_fold(ranges) / float(n) / 100.0)))
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_days", "mean_daily_range"]
    ).astype({"n_days": np.int64})


ORACLES106["daily_value_range_mean"] = """
WITH d AS (
  SELECT event_type, epoch_us(ts) // 86400000000 AS day,
         MIN(CAST(ROUND(value * 100) AS BIGINT)) AS lo,
         MAX(CAST(ROUND(value * 100) AS BIGINT)) AS hi
  FROM events GROUP BY 1, 2
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(list_sum(list(CAST(hi - lo AS DOUBLE) ORDER BY day))
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS mean_daily_range
FROM d GROUP BY 1
"""


QUERIES106["peak_hour_offset_by_type"] = q_peak_hour_offset_by_type
QUERIES106["segment_nation_chi2"] = q_segment_nation_chi2
QUERIES106["daily_value_range_mean"] = q_daily_value_range_mean
