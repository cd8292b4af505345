"""Round-3 batch 84: status and shape-of-value operators — the order
status mix (count and revenue share per o_orderstatus), the per-supplier
return rate (which suppliers' shipments come back), and the skewness /
excess kurtosis of event values per type (the moment profile of the
metric stream, complementing load_kurtosis on counts).

House parity: counts and cents are exact integers; third/fourth cent
powers accumulate in Python big ints and SQL HUGEINTs before one shared
CAST-to-DOUBLE; every moment combination is transcribed op-for-op
(central moments from raw power sums, skew = m3/(m2*sqrt(m2)),
kurtosis = m4/(m2*m2) - 3).

Scale contracts: all three are pure partial+final aggregates with
bounded outputs.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES82: dict = {}
ORACLES82: dict = {}


# ---------------------------------------------------------------------------
# Order status mix
# ---------------------------------------------------------------------------


def q_order_status_mix(sf_dir: str):
    """Per o_orderstatus: order count, count share, total value and
    value share — exact cents and integer counts, four transcribed
    divisions."""
    orders = _read(sf_dir, "orders", ["o_orderstatus", "o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "status": batch["o_orderstatus"],
                    "n": np.ones(len(batch), dtype=np.int64),
                    "cents": _cents(batch["o_totalprice"]),
                }
            )
            .groupby("status", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            orders.map_batches(partial, batch_format="pandas"),
            ["status"],
            [("n", "sum"), ("cents", "sum")],
        )
        .to_pandas()
        .sort_values("status")
    )
    tot_n = int(agg["n_sum"].sum())
    tot_c = int(agg["cents_sum"].sum())
    return pd.DataFrame(
        {
            "status": agg["status"].astype(str),
            "n_orders": agg["n_sum"].astype(np.int64),
            "count_share": _r6away(
                agg["n_sum"].to_numpy(np.float64) / float(tot_n)
            ),
            "total_value": _r6away(
                agg["cents_sum"].to_numpy(np.float64) / 100.0
            ),
            "value_share": _r6away(
                agg["cents_sum"].to_numpy(np.float64) / float(tot_c)
            ),
        }
    ).reset_index(drop=True)


ORACLES82["order_status_mix"] = """
WITH a AS (
  SELECT o_orderstatus AS status, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
t AS (SELECT SUM(n) AS tn, CAST(SUM(cents) AS BIGINT) AS tc FROM a)
SELECT a.status, CAST(a.n AS BIGINT) AS n_orders,
       ROUND(CAST(a.n AS DOUBLE) / CAST(t.tn AS DOUBLE), 6) AS count_share,
       ROUND(CAST(a.cents AS DOUBLE) / 100.0, 6) AS total_value,
       ROUND(CAST(a.cents AS DOUBLE) / CAST(t.tc AS DOUBLE), 6)
         AS value_share
FROM a, t
"""


# ---------------------------------------------------------------------------
# Supplier return rate
# ---------------------------------------------------------------------------


def q_supplier_return_rate(sf_dir: str):
    """Per supplier: shipment count, returned count (l_returnflag='R'),
    and the return rate — one exchange, one division."""
    li = _read(sf_dir, "lineitem", ["l_suppkey", "l_returnflag"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "suppkey": batch["l_suppkey"].astype(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                    "r": (batch["l_returnflag"] == "R").astype(np.int64),
                }
            )
            .groupby("suppkey", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            li.map_batches(partial, batch_format="pandas"),
            ["suppkey"],
            [("n", "sum"), ("r", "sum")],
        )
        .to_pandas()
        .sort_values("suppkey")
    )
    return pd.DataFrame(
        {
            "suppkey": agg["suppkey"].astype(np.int64),
            "n_items": agg["n_sum"].astype(np.int64),
            "n_returned": agg["r_sum"].astype(np.int64),
            "return_rate": _r6away(
                agg["r_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES82["supplier_return_rate"] = """
SELECT l_suppkey AS suppkey,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT)
         AS n_returned,
       ROUND(CAST(COUNT(*) FILTER (WHERE l_returnflag = 'R') AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS return_rate
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Value skewness / kurtosis per event_type
# ---------------------------------------------------------------------------


def q_value_skew_kurtosis(sf_dir: str):
    """Per event_type: population skewness and excess kurtosis of the
    event centivalues from exact raw power sums (Python big ints ==
    SQL HUGEINT, one CAST each)."""

    # NOTE: power sums are carried as float64 partials ONLY if exact —
    # cents <= ~1e5 so x^4 <= 1e20 overflows float64's integer range;
    # carry them as Python-int strings instead via object dtype.
    def partial_exact(batch: pd.DataFrame) -> pd.DataFrame:
        c = _cents(batch["value"])
        types = batch["event_type"].to_numpy()
        out = []
        for et in np.unique(types):
            v = c[types == et]
            vi = [int(x) for x in v]
            out.append(
                (
                    et,
                    len(vi),
                    sum(vi),
                    sum(x * x for x in vi),
                    str(sum(x * x * x for x in vi)),
                    str(sum(x * x * x * x for x in vi)),
                )
            )
        return pd.DataFrame(
            out, columns=["event_type", "n", "s1", "s2", "s3", "s4"]
        ).astype({"n": np.int64, "s1": np.int64, "s2": np.int64})

    parts = (
        _events(sf_dir, ["event_type", "value"])
        .map_batches(partial_exact, batch_format="pandas")
        .to_pandas()
    )
    out_empty = pd.DataFrame(
        {"event_type": pd.Series(dtype=object),
         "n_events": pd.Series(dtype=np.int64),
         "skewness": pd.Series(dtype=np.float64),
         "kurtosis_excess": pd.Series(dtype=np.float64)}
    )
    if parts.empty:
        return out_empty
    rows = []
    for et, g in parts.groupby("event_type", sort=True):
        n = int(g["n"].sum())
        if n < 2:
            continue
        s1 = int(g["s1"].sum())
        s2 = int(g["s2"].sum())
        s3 = sum(int(x) for x in g["s3"])
        s4 = sum(int(x) for x in g["s4"])
        m = float(s1) / n
        m2 = float(s2) / n - m * m
        if m2 <= 0.0:
            continue
        m3 = float(s3) / n - 3.0 * m * (float(s2) / n) + 2.0 * m * m * m
        m4 = (
            float(s4) / n
            - 4.0 * m * (float(s3) / n)
            + 6.0 * m * m * (float(s2) / n)
            - 3.0 * m * m * m * m
        )
        skew = m3 / (m2 * math.sqrt(m2))
        kurt = m4 / (m2 * m2) - 3.0
        rows.append((et, n, float(_r6away(skew)), float(_r6away(kurt))))
    if not rows:
        return out_empty
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_events", "skewness", "kurtosis_excess"],
    ).astype({"n_events": np.int64})


ORACLES82["value_skew_kurtosis"] = """
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
s AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
         CAST(SUM(CAST(c AS HUGEINT) * c * c) AS HUGEINT) AS s3,
         CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS HUGEINT) AS s4
  FROM b GROUP BY 1 HAVING COUNT(*) >= 2
),
f AS (
  SELECT event_type, n,
         CAST(s1 AS DOUBLE) / n AS m,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3,
         CAST(s4 AS DOUBLE) / n AS r4
  FROM s
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       ROUND((r3 - 3.0 * m * r2 + 2.0 * m * m * m)
             / (m2 * sqrt(m2)), 6) AS skewness,
       ROUND((r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m)
             / (m2 * m2) - 3.0, 6) AS kurtosis_excess
FROM f WHERE m2 > 0
"""


QUERIES82["order_status_mix"] = q_order_status_mix
QUERIES82["supplier_return_rate"] = q_supplier_return_rate
QUERIES82["value_skew_kurtosis"] = q_value_skew_kurtosis
