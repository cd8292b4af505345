"""Round-3 batch 34: calendar and lifecycle diagnostics — order
seasonality by month-of-year (share + chi-square vs uniform over the
multi-year order history), the discount-by-quantity curve (is bulk
actually cheaper — mean discount basis points per integer quantity),
and the user lifetime histogram (days between first and last event per
user).

House parity: month-of-year counts are exact integers with the 12
(o-e)^2/e terms folded in ascending month order (chi2_hour_of_day
contract); discounts cross the exchange as exact basis-point integers;
lifetimes are exact integer day differences from min/max exchanges.

Scale contracts: month / quantity / lifetime-day histograms are all
cardinality-bounded after one exchange each; per-user min+max reduce
in the same pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES32: dict = {}
ORACLES32: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Order seasonality by month-of-year
# ---------------------------------------------------------------------------


def q_order_month_seasonality(sf_dir: str):
    """Per calendar month (1-12): order count, share, and the global
    chi-square against a uniform month mix over the multi-year order
    history — the demand-seasonality screen. Exact integer counts; the
    12 (o-e)^2/e terms fold in ascending month order."""
    orders = _read(sf_dir, "orders", ["o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "month": pd.DatetimeIndex(b["o_orderdate"]).month.astype(np.int64),
            }
        )
        .groupby("month", sort=False)
        .size()
        .reset_index(name="n"),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(orders, ["month"], [("n", "sum")])
        .to_pandas()
        .sort_values("month")
    )
    o = np.zeros(12, dtype=np.int64)
    o[agg["month"].to_numpy(np.int64) - 1] = agg["n_sum"].to_numpy(np.int64)
    total = int(o.sum())
    e = float(total) / 12.0
    chi2 = float(
        _r6away(_fold([(float(int(x)) - e) * (float(int(x)) - e) / e for x in o]))
    )
    share = [float(_r6away(float(int(x)) / float(total))) for x in o]
    return pd.DataFrame(
        {
            "month": np.arange(1, 13, dtype=np.int64),
            "n_orders": o,
            "share": share,
            "chi2": [chi2] * 12,
        }
    )


ORACLES32["order_month_seasonality"] = """
WITH m AS (
  SELECT CAST(month(o_orderdate) AS BIGINT) AS month, COUNT(*) AS n
  FROM orders GROUP BY 1
),
months AS (SELECT UNNEST(generate_series(1, 12)) AS month),
dense AS (
  SELECT CAST(months.month AS BIGINT) AS month,
         CAST(COALESCE(m.n, 0) AS BIGINT) AS o
  FROM months LEFT JOIN m ON m.month = months.month
),
tot AS (SELECT CAST(SUM(o) AS BIGINT) AS total FROM dense),
chi AS (
  SELECT ROUND(list_sum(list(
           (CAST(d.o AS DOUBLE) - CAST(t.total AS DOUBLE) / 12.0)
           * (CAST(d.o AS DOUBLE) - CAST(t.total AS DOUBLE) / 12.0)
           / (CAST(t.total AS DOUBLE) / 12.0)
           ORDER BY d.month)), 6) AS chi2
  FROM dense d CROSS JOIN tot t
)
SELECT d.month,
       d.o AS n_orders,
       ROUND(CAST(d.o AS DOUBLE) / CAST(t.total AS DOUBLE), 6) AS share,
       c.chi2
FROM dense d CROSS JOIN tot t CROSS JOIN chi c
"""


# ---------------------------------------------------------------------------
# Discount by quantity curve
# ---------------------------------------------------------------------------


def q_discount_by_quantity(sf_dir: str):
    """Per integer lineitem quantity: item count and mean discount in
    basis points — does buying more earn a better rate. Discounts
    cross the exchange as exact bp integers; one transcribed
    division."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "qty": np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64),
                "bp": np.rint(
                    b["l_discount"].to_numpy(np.float64) * 10000
                ).astype(np.int64),
            }
        )
        .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby("qty", sort=False)
        .agg(n=("n", "sum"), bp=("bp", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(li, ["qty"], [("n", "sum"), ("bp", "sum")])
        .to_pandas()
        .sort_values("qty")
    )
    mean_bp = [
        float(_r6away(float(int(b)) / float(int(n))))
        for b, n in zip(agg["bp_sum"], agg["n_sum"])
    ]
    return pd.DataFrame(
        {
            "qty": agg["qty"].to_numpy(np.int64),
            "n_items": agg["n_sum"].to_numpy(np.int64),
            "total_bp": agg["bp_sum"].to_numpy(np.int64),
            "mean_discount_bp": mean_bp,
        }
    ).reset_index(drop=True)


ORACLES32["discount_by_quantity"] = """
WITH l AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS qty,
         CAST(ROUND(l_discount * 10000) AS BIGINT) AS bp
  FROM lineitem
)
SELECT qty,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM(bp) AS BIGINT) AS total_bp,
       ROUND(CAST(SUM(bp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_discount_bp
FROM l GROUP BY 1
"""


# ---------------------------------------------------------------------------
# User lifetime histogram
# ---------------------------------------------------------------------------


def q_user_lifetime_histogram(sf_dir: str):
    """How many users have a lifetime of exactly d days (floor of the
    span between their first and last event) — single-visit users pile
    at 0, loyal ones stretch right. Per-user min+max reduce in one
    exchange; lifetimes and the histogram are exact integers."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "lo": b["ts"].to_numpy("datetime64[us]").view(np.int64),
                "hi": b["ts"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby("user_id", sort=False)
        .agg(lo=("lo", "min"), hi=("hi", "max"))
        .reset_index(),
        batch_format="pandas",
    )
    per_user = hash_bucket_aggregate(
        ev, ["user_id"], [("lo", "min"), ("hi", "max")]
    )
    hist = hash_bucket_aggregate(
        per_user.map_batches(
            lambda b: pd.DataFrame(
                {
                    "lifetime_d": (
                        b["hi_max"].astype(np.int64) - b["lo_min"].astype(np.int64)
                    )
                    // DAY_US,
                    "c": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["lifetime_d"],
        [("c", "sum")],
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "lifetime_d": hist["lifetime_d"].astype(np.int64),
                "n_users": hist["c_sum"].astype(np.int64),
            }
        )
        .sort_values("lifetime_d")
        .reset_index(drop=True)
    )


ORACLES32["user_lifetime_histogram"] = """
WITH u AS (
  SELECT user_id,
         (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 86400000000 AS d
  FROM events GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS lifetime_d,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""


QUERIES32["order_month_seasonality"] = q_order_month_seasonality
QUERIES32["discount_by_quantity"] = q_discount_by_quantity
QUERIES32["user_lifetime_histogram"] = q_user_lifetime_histogram
