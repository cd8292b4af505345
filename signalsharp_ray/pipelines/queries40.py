"""Round-3 batch 42: pricing-surface and cumulative-mass diagnostics —
the (event type x hour-of-day) mean-value heatmap (when each action is
expensive), the revenue median month (the first month cumulative
revenue reaches half the total — where the business's mass sits in
time), and the order day-of-week mix over the multi-year history
(epoch-day dow formula, share per weekday).

House parity: heatmap cells divide exact centivalue sums by exact
counts; the median-month crossover is the pure integer comparison
2*cum >= total over month-ordered exact cents; dow uses the
(epoch_us // day_us + 4) % 7 integer formula on both engines.

Scale contracts: the heatmap is catalog x 24 bounded; monthly revenue
and dow tables are bounded; all reductions are single exchanges.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _cents_col, _read

QUERIES40: dict = {}
ORACLES40: dict = {}

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Type x hour-of-day mean-value heatmap
# ---------------------------------------------------------------------------


def q_value_heatmap(sf_dir: str):
    """Mean event value (dollars) for every (event type, hour-of-day)
    cell — the stake-size surface over the behavioural day
    (activity_heatmap counts; this prices). Exact centivalue sums; one
    transcribed division per cell."""
    ev = _events(sf_dir, ["ts", "event_type", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "hod": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
                )
                % 24,
                "c": _cents(b["value"]),
            }
        )
        .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby(["event_type", "hod"], sort=False)
        .agg(n=("n", "sum"), s=("c", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(
            ev, ["event_type", "hod"], [("n", "sum"), ("s", "sum")]
        )
        .to_pandas()
        .sort_values(["event_type", "hod"])
    )
    mean = [
        float(_r6away(float(int(s)) / float(int(n)) / 100.0))
        for s, n in zip(agg["s_sum"], agg["n_sum"])
    ]
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "hod": agg["hod"].astype(np.int64),
            "n_events": agg["n_sum"].astype(np.int64),
            "mean_value": mean,
        }
    ).reset_index(drop=True)


ORACLES40["value_heatmap"] = """
WITH a AS (
  SELECT event_type,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST(hod AS BIGINT) AS hod,
       CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_value
FROM a
"""


# ---------------------------------------------------------------------------
# Revenue median month
# ---------------------------------------------------------------------------


def q_revenue_median_month(sf_dir: str):
    """The first order month at which cumulative order revenue reaches
    half the all-time total (integer test 2*cum >= total over exact
    cents) — where the revenue mass sits in the multi-year history.
    One bounded monthly exchange; pure integer comparisons."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "month_us": b["o_orderdate"]
                .to_numpy("datetime64[us]")
                .astype("datetime64[M]")
                .astype("datetime64[us]")
                .view(np.int64),
                "c": _cents_col(b["o_totalprice"]),
            }
        )
        .groupby("month_us", sort=False)["c"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(orders, ["month_us"], [("c", "sum")])
        .to_pandas()
        .sort_values("month_us")
        .reset_index(drop=True)
    )
    total = int(agg["c_sum"].sum())
    cum = np.cumsum(agg["c_sum"].to_numpy(np.int64))
    idx = int(np.flatnonzero(2 * cum >= total)[0])
    return pd.DataFrame(
        {
            "n_months": np.array([len(agg)], dtype=np.int64),
            "median_month_us": np.array(
                [int(agg["month_us"].iloc[idx])], dtype=np.int64
            ),
            "cum_at_median_c": np.array([int(cum[idx])], dtype=np.int64),
            "total_c": np.array([total], dtype=np.int64),
        }
    )


ORACLES40["revenue_median_month"] = """
WITH m AS (
  SELECT date_trunc('month', o_orderdate) AS month,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
w AS (
  SELECT month, c,
         CAST(SUM(c) OVER (ORDER BY month) AS BIGINT) AS cum,
         CAST(SUM(c) OVER () AS BIGINT) AS total,
         COUNT(*) OVER () AS n_months
  FROM m
),
hit AS (
  SELECT month, cum, total, n_months,
         ROW_NUMBER() OVER (ORDER BY month) AS rn
  FROM w WHERE 2 * cum >= total
)
SELECT CAST(n_months AS BIGINT) AS n_months,
       CAST(epoch_us(month) AS BIGINT) AS median_month_us,
       cum AS cum_at_median_c,
       total AS total_c
FROM hit WHERE rn = 1
"""


# ---------------------------------------------------------------------------
# Order day-of-week mix
# ---------------------------------------------------------------------------


def q_order_dow_mix(sf_dir: str):
    """Order counts and share per day-of-week over the whole history
    (dow = (epoch_day + 4) % 7, 0 = Sunday — the same integer formula
    on both engines) — is commerce calendar-flat. Exact integers; one
    share division."""
    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "dow": (
                    b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64)
                    // DAY_US
                    + 4
                )
                % 7,
            }
        )
        .groupby("dow", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(orders, ["dow"], [("n", "sum")])
        .to_pandas()
        .sort_values("dow")
    )
    total = int(agg["n_sum"].sum())
    share = [
        float(_r6away(float(int(n)) / float(total))) for n in agg["n_sum"]
    ]
    return pd.DataFrame(
        {
            "dow": agg["dow"].astype(np.int64),
            "n_orders": agg["n_sum"].astype(np.int64),
            "share": share,
        }
    ).reset_index(drop=True)


ORACLES40["order_dow_mix"] = """
WITH a AS (
  SELECT (epoch_us(o_orderdate) // 86400000000 + 4) % 7 AS dow,
         COUNT(*) AS n
  FROM orders GROUP BY 1
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6) AS share
FROM a
"""


QUERIES40["value_heatmap"] = q_value_heatmap
QUERIES40["revenue_median_month"] = q_revenue_median_month
QUERIES40["order_dow_mix"] = q_order_dow_mix
