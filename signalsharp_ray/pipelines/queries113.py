"""Round-3 batch 115: fulfilment-calendar and demand-mix operators —
mean ship lead time by the ORDER's day-of-week (do Friday orders wait
over the weekend), the mean priority-mix entropy across repeat
customers (single-priority habit vs varied urgency), and the order
count/share per (year, quarter).

House parity: lead days are exact midnight-timestamp day differences
through the co-partitioned join; per-customer entropies fold
priority-ascending with a customer-ascending outer mean; quarter keys
are exact integer calendar arithmetic.

Scale contracts: the lead-time join buckets on orderkey; entropies
reduce per customer; the quarter mix is a bounded aggregate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES113: dict = {}
ORACLES113: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Lead time by order day-of-week
# ---------------------------------------------------------------------------


def q_lead_time_by_dow(sf_dir: str):
    """Per order-date day-of-week (0=Mon): shipment count and mean
    lead time in days (l_shipdate - o_orderdate)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype(np.int64),
                "ship_day": (
                    b["l_shipdate"].astype("datetime64[us]").astype("int64")
                    // DAY_US
                ).astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].astype(np.int64),
                "ord_day": (
                    b["o_orderdate"].astype("datetime64[us]").astype("int64")
                    // DAY_US
                ).astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(li, orders, on=["l_orderkey"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "ord_day" not in batch.columns:
            return pd.DataFrame(
                {"dow": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64),
                 "days": pd.Series(dtype=np.int64)}
            )
        b = batch.dropna(subset=["ord_day"])
        od = b["ord_day"].astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "dow": ((od + 3) % 7).astype(np.int64),
                    "n": np.ones(len(b), dtype=np.int64),
                    "days": (b["ship_day"].astype(np.int64) - od).astype(
                        np.int64
                    ),
                }
            )
            .groupby("dow", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            joined.map_batches(partial, batch_format="pandas"),
            ["dow"],
            [("n", "sum"), ("days", "sum")],
        )
        .to_pandas()
        .sort_values("dow")
    )
    return pd.DataFrame(
        {
            "dow": agg["dow"].astype(np.int64),
            "n_shipments": agg["n_sum"].astype(np.int64),
            "mean_lead_days": _r6away(
                agg["days_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES113["lead_time_by_dow"] = """
SELECT CAST((epoch_us(o.o_orderdate) // 86400000000 + 3) % 7 AS BIGINT)
         AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_shipments,
       ROUND(CAST(SUM(epoch_us(l.l_shipdate) // 86400000000
                      - epoch_us(o.o_orderdate) // 86400000000) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_lead_days
FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Customer priority-mix entropy
# ---------------------------------------------------------------------------


def q_customer_priority_entropy_mean(sf_dir: str):
    """One global row: over customers with >= 3 orders, the mean
    Shannon entropy (nats) of their order-priority mix."""
    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "priority": b["o_orderpriority"],
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby(["custkey", "priority"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        orders, ["custkey", "priority"], [("n", "sum")]
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"n_customers": pd.Series(dtype=np.int64),
         "mean_entropy": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    tot = agg.groupby("custkey")["n_sum"].sum().astype(np.int64)
    keep = sorted(tot[tot >= 3].index)
    ents = []
    for ck in keep:
        g = agg[agg["custkey"] == ck].sort_values("priority")
        t = int(tot.loc[ck])
        terms = []
        for _, r in g.iterrows():
            p = float(int(r["n_sum"])) / float(t)
            terms.append(p * math.log(p))
        ents.append(-_fold(terms))
    k = len(ents)
    if k == 0:
        return out_empty
    return pd.DataFrame(
        {
            "n_customers": np.array([k], dtype=np.int64),
            "mean_entropy": [float(_r6away(_fold(ents) / float(k)))],
        }
    )


ORACLES113["customer_priority_entropy_mean"] = """
WITH c AS (
  SELECT o_custkey, o_orderpriority AS priority, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
t AS (
  SELECT o_custkey, SUM(n) AS tot FROM c GROUP BY 1 HAVING SUM(n) >= 3
),
e AS (
  SELECT c.o_custkey,
         -list_sum(list(
           (CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
           * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
           ORDER BY c.priority)) AS ent
  FROM c JOIN t USING (o_custkey)
  GROUP BY c.o_custkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(list_sum(list(ent ORDER BY o_custkey))
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_entropy
FROM e
"""


# ---------------------------------------------------------------------------
# Order quarter mix
# ---------------------------------------------------------------------------


def q_order_quarter_mix(sf_dir: str):
    """Per (year, quarter): order count and share of all orders."""
    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "year": b["o_orderdate"].dt.year.astype(np.int64),
                "quarter": (
                    (b["o_orderdate"].dt.month.astype(np.int64) - 1) // 3 + 1
                ).astype(np.int64),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby(["year", "quarter"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(
            orders, ["year", "quarter"], [("n", "sum")]
        )
        .to_pandas()
        .sort_values(["year", "quarter"])
    )
    tot = int(agg["n_sum"].sum())
    return pd.DataFrame(
        {
            "year": agg["year"].astype(np.int64),
            "quarter": agg["quarter"].astype(np.int64),
            "n_orders": agg["n_sum"].astype(np.int64),
            "share": _r6away(agg["n_sum"].to_numpy(np.float64) / float(tot)),
        }
    ).reset_index(drop=True)


ORACLES113["order_quarter_mix"] = """
WITH c AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
         CAST((month(o_orderdate) - 1) // 3 + 1 AS BIGINT) AS quarter,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT year, quarter, CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
FROM c, t
"""


QUERIES113["lead_time_by_dow"] = q_lead_time_by_dow
QUERIES113["customer_priority_entropy_mean"] = q_customer_priority_entropy_mean
QUERIES113["order_quarter_mix"] = q_order_quarter_mix
