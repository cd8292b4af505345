"""Round-3 batch 86: lifecycle and calendar-profile operators — mean
event value by user tenure band (weeks since the user's first event:
do veterans move bigger values), the market-segment x order-priority
count matrix (which customer books order urgent), and the full
hour-of-week load profile (168 cells with shares — the table behind
peak_week_slot).

House parity: first-event selection is an integer (ts, event_id)
argmin per user through one exchange; tenure bands are exact integer
floor divisions of microsecond differences (non-negative by
construction); matrix counts and profile shares are exact integers
with one transcribed division.

Scale contracts: tenure joins first-events back co-partitioned on
user_id (bucketed_join, no driver dict); the matrix broadcasts only
the bounded customer dimension; the profile is a 168-cell aggregate.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries16 import _read

QUERIES84: dict = {}
ORACLES84: dict = {}

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
WEEK_US = 7 * DAY_US


# ---------------------------------------------------------------------------
# Mean value by user tenure band
# ---------------------------------------------------------------------------


def q_value_by_tenure_band(sf_dir: str):
    """Per tenure band (weeks since the user's FIRST event, floor):
    event count and mean centivalue/100 — does engagement age change
    the metric. First event = min (ts, event_id) per user."""
    ev = _events(sf_dir, ["user_id", "ts", "event_id", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "ts_us": b["ts"].astype("datetime64[us]").astype("int64"),
                "event_id": b["event_id"].astype(np.int64),
                "c": (
                    np.sign(b["value"].to_numpy(np.float64) * 100)
                    * np.floor(
                        np.abs(b["value"].to_numpy(np.float64) * 100) + 0.5
                    )
                ).astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    firsts = hash_bucket_aggregate(
        ev.map_batches(
            lambda b: b[["user_id", "ts_us"]],
            batch_format="pandas",
        ),
        ["user_id"],
        [("ts_us", "min")],
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "first_us": b["ts_us_min"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(ev, firsts, on=["user_id"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "first_us" not in batch.columns:
            return pd.DataFrame(
                {"band": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64),
                 "s": pd.Series(dtype=np.int64)}
            )
        b = batch.dropna(subset=["first_us"])
        band = (
            (b["ts_us"].astype(np.int64) - b["first_us"].astype(np.int64))
            // WEEK_US
        )
        return (
            pd.DataFrame(
                {
                    "band": band.astype(np.int64),
                    "n": np.ones(len(b), dtype=np.int64),
                    "s": b["c"].astype(np.int64),
                }
            )
            .groupby("band", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            joined.map_batches(partial, batch_format="pandas"),
            ["band"],
            [("n", "sum"), ("s", "sum")],
        )
        .to_pandas()
        .sort_values("band")
    )
    return pd.DataFrame(
        {
            "tenure_weeks": agg["band"].astype(np.int64),
            "n_events": agg["n_sum"].astype(np.int64),
            "mean_value": _r6away(
                agg["s_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
                / 100.0
            ),
        }
    ).reset_index(drop=True)


ORACLES84["value_by_tenure_band"] = """
WITH f AS (
  SELECT user_id, MIN(epoch_us(ts)) AS first_us FROM events GROUP BY 1
),
b AS (
  SELECT (epoch_us(e.ts) - f.first_us) // 604800000000 AS band,
         CAST(ROUND(e.value * 100) AS BIGINT) AS c
  FROM events e JOIN f USING (user_id)
)
SELECT CAST(band AS BIGINT) AS tenure_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0, 6)
         AS mean_value
FROM b GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Market-segment x order-priority matrix
# ---------------------------------------------------------------------------


def q_segment_priority_matrix(sf_dir: str):
    """Counts and within-segment share per (c_mktsegment,
    o_orderpriority) — does the segment drive urgency. Exact integers.

    Scale shape: orders pre-reduce per (custkey, priority) — at most
    5 x |customer| rows cross the join exchange — then the customer
    segment attaches via one co-partitioned bucketed_join (customer is
    O(sf); never a driver dict)."""
    from ..common.raytools import bucketed_join

    per_cust = hash_bucket_aggregate(
        _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "custkey": b["o_custkey"].astype(np.int64),
                    "priority": b["o_orderpriority"].astype(str),
                    "n": np.ones(len(b), dtype=np.int64),
                }
            )
            .groupby(["custkey", "priority"], sort=False)
            .sum()
            .reset_index(),
            batch_format="pandas",
        ),
        ["custkey", "priority"],
        [("n", "sum")],
    )
    dim = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["c_custkey"].astype(np.int64),
                "segment": b["c_mktsegment"].astype(str),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_cust, dim, on=["custkey"])

    def by_cell(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "segment": batch["segment"].astype(str),
                    "priority": batch["priority"].astype(str),
                    "n": batch["n_sum"].astype(np.int64),
                }
            )
            .groupby(["segment", "priority"], sort=False)
            .sum()
            .reset_index()
        )

    # 5 segments x 5 priorities: the driver-side combine is 25 cells
    agg = (
        joined.map_batches(by_cell, batch_format="pandas")
        .to_pandas()
        .groupby(["segment", "priority"], sort=True)
        .sum()
        .reset_index()
        .rename(columns={"n": "n_sum"})
        .sort_values(["segment", "priority"])
    )
    seg_tot = (
        agg.groupby("segment")["n_sum"].transform("sum").astype(np.int64)
    )
    return pd.DataFrame(
        {
            "segment": agg["segment"].astype(str),
            "priority": agg["priority"].astype(str),
            "n_orders": agg["n_sum"].astype(np.int64),
            "segment_share": _r6away(
                agg["n_sum"].to_numpy(np.float64)
                / seg_tot.to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES84["segment_priority_matrix"] = """
WITH m AS (
  SELECT c.c_mktsegment AS segment, o.o_orderpriority AS priority,
         COUNT(*) AS n
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
),
t AS (SELECT segment, SUM(n) AS tot FROM m GROUP BY 1)
SELECT m.segment, m.priority, CAST(m.n AS BIGINT) AS n_orders,
       ROUND(CAST(m.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
         AS segment_share
FROM m JOIN t USING (segment)
"""


# ---------------------------------------------------------------------------
# Hour-of-week load profile
# ---------------------------------------------------------------------------


def q_hour_of_week_counts(sf_dir: str):
    """The 168-cell (dow, hod) event count profile with global shares
    — the full table behind peak_week_slot. dow 0=Mon."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: (
            lambda us: pd.DataFrame(
                {
                    "dow": ((us // DAY_US + 3) % 7).astype(np.int64),
                    "hod": ((us // HOUR_US) % 24).astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                }
            )
        )(b["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        .groupby(["dow", "hod"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(ev, ["dow", "hod"], [("n", "sum")])
        .to_pandas()
        .sort_values(["dow", "hod"])
    )
    tot = int(agg["n_sum"].sum())
    return pd.DataFrame(
        {
            "dow": agg["dow"].astype(np.int64),
            "hod": agg["hod"].astype(np.int64),
            "n_events": agg["n_sum"].astype(np.int64),
            "share": _r6away(agg["n_sum"].to_numpy(np.float64) / float(tot)),
        }
    ).reset_index(drop=True)


ORACLES84["hour_of_week_counts"] = """
WITH c AS (
  SELECT (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT CAST(dow AS BIGINT) AS dow, CAST(hod AS BIGINT) AS hod,
       CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
FROM c, t
"""


QUERIES84["value_by_tenure_band"] = q_value_by_tenure_band
QUERIES84["segment_priority_matrix"] = q_segment_priority_matrix
QUERIES84["hour_of_week_counts"] = q_hour_of_week_counts
