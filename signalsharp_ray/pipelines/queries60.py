"""Round-3 batch 62: mix and reconciliation audits — the per-type value
mix (count, exact value sum and value share per event type — the
revenue-attribution table beside profile_events' global profile), and
the order-total reconciliation audit (header o_totalprice vs the
lineitem-derived sum extendedprice x (1 - discount) x (1 + tax):
under / exact / over counts and the mean absolute gap — the ledger
consistency check every ingestion runs).

House parity: value sums are exact cents; the lineitem-derived total
is an exact integer in 10^-4-cent units (cents x percent x percent)
compared against the header total scaled by 10^4; the gap statistics
are integer sums with one transcribed division.

Scale contracts: the mix table is catalog-bounded; reconciliation
reduces per order through one exchange then a 1-row audit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _cents_col, _read

QUERIES60: dict = {}
ORACLES60: dict = {}


# ---------------------------------------------------------------------------
# Per-type value mix
# ---------------------------------------------------------------------------


def q_type_value_mix(sf_dir: str):
    """Per event type: event count, exact value total, and the share
    of all value — where the money sits across behaviours. Exact
    cents; one share division."""
    ev = _events(sf_dir, ["event_type", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {"event_type": b["event_type"], "c": _cents(b["value"])}
        )
        .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby("event_type", sort=False)
        .agg(n=("n", "sum"), s=("c", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(ev, ["event_type"], [("n", "sum"), ("s", "sum")])
        .to_pandas()
        .sort_values("event_type")
    )
    total = int(agg["s_sum"].sum())
    share = [
        float(_r6away(float(int(s)) / float(total))) for s in agg["s_sum"]
    ]
    return pd.DataFrame(
        {
            "event_type": agg["event_type"],
            "n_events": agg["n_sum"].astype(np.int64),
            "value_c": agg["s_sum"].astype(np.int64),
            "value_share": share,
        }
    ).reset_index(drop=True)


ORACLES60["type_value_mix"] = """
WITH a AS (
  SELECT event_type, COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_events,
       s AS value_c,
       ROUND(CAST(s AS DOUBLE) / CAST(SUM(s) OVER () AS DOUBLE), 6)
         AS value_share
FROM a
"""


# ---------------------------------------------------------------------------
# Order-total reconciliation audit
# ---------------------------------------------------------------------------


def q_order_total_reconciliation(sf_dir: str):
    """Does the order header price equal the lineitem-derived total
    sum(extendedprice x (1-discount) x (1+tax))? Counts of orders
    under / exactly at / over the derived total plus the mean absolute
    gap in dollars — the ledger-consistency audit. The derived total
    is an exact integer in 10^-4-cent units (cents x pct x pct)
    against the header total x 10^4."""
    li = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_extendedprice", "l_discount", "l_tax"],
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "u": _cents(b["l_extendedprice"])
                * np.rint(
                    (1.0 - b["l_discount"].to_numpy(np.float64)) * 100
                ).astype(np.int64)
                * np.rint(
                    (1.0 + b["l_tax"].to_numpy(np.float64)) * 100
                ).astype(np.int64),
            }
        )
        .groupby("orderkey", sort=False)["u"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    derived = hash_bucket_aggregate(li, ["orderkey"], [("u", "sum")])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "hc": _cents_col(b["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(orders, derived, on=["orderkey"], how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        header_u = b["hc"].astype(np.int64).to_numpy() * 10000
        diff = header_u - b["u_sum"].astype(np.int64).to_numpy()
        abs_sum = sum(int(abs(x)) for x in diff)
        return pd.DataFrame(
            {
                "key": np.zeros(1, dtype=np.int64),
                "n": np.array([len(b)], dtype=np.int64),
                "under": np.array([int((diff < 0).sum())], dtype=np.int64),
                "exact": np.array([int((diff == 0).sum())], dtype=np.int64),
                "over": np.array([int((diff > 0).sum())], dtype=np.int64),
                "abs_hi": np.array([abs_sum >> 32], dtype=np.int64),
                "abs_lo": np.array([abs_sum & ((1 << 32) - 1)], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["key"],
        [
            ("n", "sum"), ("under", "sum"), ("exact", "sum"), ("over", "sum"),
            ("abs_hi", "sum"), ("abs_lo", "sum"),
        ],
    ).to_pandas().iloc[0]
    n = int(agg["n_sum"])
    abs_total = (int(agg["abs_hi_sum"]) << 32) + int(agg["abs_lo_sum"])
    mean_abs = float(abs_total) / float(n) / 1000000.0
    return pd.DataFrame(
        {
            "n_orders": np.array([n], dtype=np.int64),
            "n_under": np.array([int(agg["under_sum"])], dtype=np.int64),
            "n_exact": np.array([int(agg["exact_sum"])], dtype=np.int64),
            "n_over": np.array([int(agg["over_sum"])], dtype=np.int64),
            "mean_abs_gap": [float(_r6away(mean_abs))],
        }
    )


ORACLES60["order_total_reconciliation"] = """
WITH d AS (
  SELECT l_orderkey,
         SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)::HUGEINT
             * CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT)::HUGEINT
             * CAST(ROUND((1.0 + l_tax) * 100) AS BIGINT)::HUGEINT) AS u
  FROM lineitem GROUP BY 1
),
j AS (
  SELECT CAST(ROUND(o.o_totalprice * 100) AS BIGINT)::HUGEINT * 10000 - d.u
           AS diff
  FROM orders o JOIN d ON d.l_orderkey = o.o_orderkey
),
a AS (
  SELECT COUNT(*) AS n,
         CAST(COUNT(*) FILTER (WHERE diff < 0) AS BIGINT) AS under,
         CAST(COUNT(*) FILTER (WHERE diff = 0) AS BIGINT) AS ex,
         CAST(COUNT(*) FILTER (WHERE diff > 0) AS BIGINT) AS over,
         SUM(ABS(diff)) AS abs_total
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_orders,
       under AS n_under,
       ex AS n_exact,
       over AS n_over,
       ROUND(CAST(abs_total AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
         AS mean_abs_gap
FROM a
"""


QUERIES60["type_value_mix"] = q_type_value_mix
QUERIES60["order_total_reconciliation"] = q_order_total_reconciliation
