"""Round-3 batch 51: participation-inequality diagnostics — the Gini
coefficient of order counts across customers (how concentrated
commerce activity is over the buyer base — the relational twin of
lorenz_deciles), and the active-days-per-user histogram (how many
distinct days each user shows up — the engagement depth behind
dau_mau_stickiness).

House parity: the Gini numerator is the house integer formula
sum((2i-n-1) x_(i)) under a deterministic (count, custkey) sort;
active-day distinct counts dedup inside the exchange; everything else
is integer arithmetic with one division.

Scale contracts: per-customer counts reduce through one exchange (the
driver-side rank fold is the hill/gini documented contract); the
histogram is retention-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries16 import _read

QUERIES49: dict = {}
ORACLES49: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Order-count Gini across customers
# ---------------------------------------------------------------------------


def q_order_gini(sf_dir: str):
    """Gini coefficient of order counts across customers WITH orders —
    0 = everyone orders equally, 1 = one whale does everything. The
    exact integer numerator sum((2i-n-1) x_(i)) under a deterministic
    (count, custkey) sort; one division by n*S."""
    orders = _read(sf_dir, "orders", ["o_custkey"]).map_batches(
        lambda b: pd.DataFrame({"custkey": b["o_custkey"].astype(np.int64)})
        .groupby("custkey", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    per_cust = (
        hash_bucket_aggregate(orders, ["custkey"], [("n", "sum")])
        .to_pandas()
        .sort_values(["n_sum", "custkey"])
    )
    v = per_cust["n_sum"].to_numpy(np.int64)
    n = int(v.size)
    i = np.arange(1, n + 1, dtype=np.int64)
    num = int(np.sum((2 * i - n - 1) * v))
    s = int(v.sum())
    return pd.DataFrame(
        {
            "n_customers": np.array([n], dtype=np.int64),
            "n_orders": np.array([s], dtype=np.int64),
            "gini_num": np.array([num], dtype=np.int64),
            "gini": [float(_r6away(float(num) / (float(n) * float(s))))],
        }
    )


ORACLES49["order_gini"] = """
WITH c AS (
  SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1
),
r AS (
  SELECT n,
         ROW_NUMBER() OVER (ORDER BY n, o_custkey) AS i,
         COUNT(*) OVER () AS cnt
  FROM c
),
a AS (
  SELECT MAX(cnt) AS n_customers,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM((2 * i - cnt - 1) * n) AS BIGINT) AS num
  FROM r
)
SELECT CAST(n_customers AS BIGINT) AS n_customers,
       s AS n_orders,
       num AS gini_num,
       ROUND(CAST(num AS DOUBLE)
             / (CAST(n_customers AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS gini
FROM a
"""


# ---------------------------------------------------------------------------
# Active-days-per-user histogram
# ---------------------------------------------------------------------------


def q_active_days_histogram(sf_dir: str):
    """How many users are active on exactly d distinct days — the
    engagement-depth distribution (user_lifetime_histogram measures
    span; this measures presence). Distinct (user, day) pairs dedup
    inside one exchange; the histogram is retention-bounded."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
            }
        )
        .drop_duplicates()
        .assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
        batch_format="pandas",
    )
    pairs = hash_bucket_aggregate(ev, ["user_id", "day_us"], [("one", "max")])
    per_user = hash_bucket_aggregate(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {
                    "user_id": b["user_id"].astype(np.int64),
                    "d": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["user_id"],
        [("d", "sum")],
    )
    hist = hash_bucket_aggregate(
        per_user.map_batches(
            lambda b: pd.DataFrame(
                {
                    "active_days": b["d_sum"].astype(np.int64),
                    "c": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["active_days"],
        [("c", "sum")],
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "active_days": hist["active_days"].astype(np.int64),
                "n_users": hist["c_sum"].astype(np.int64),
            }
        )
        .sort_values("active_days")
        .reset_index(drop=True)
    )


ORACLES49["active_days_histogram"] = """
WITH u AS (
  SELECT user_id, COUNT(DISTINCT date_trunc('day', ts)) AS d
  FROM events GROUP BY 1
)
SELECT CAST(d AS BIGINT) AS active_days,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""


QUERIES49["order_gini"] = q_order_gini
QUERIES49["active_days_histogram"] = q_active_days_histogram
