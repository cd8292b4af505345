"""Round-4 batch 139: attribution and demand classification — linear
multi-touch attribution (every event in the hour before a purchase
shares the conversion credit equally — the counterpart of the existing
first-touch model), and XYZ demand-variability classification per part
(the companion axis to abc_analysis: X = steady, Y = variable, Z =
erratic weekly demand).

House parity: attribution emits PER-PURCHASE rows (no cross-row float
reduction anywhere); the credit 1/k is one shared division per row.
XYZ classes use fully-INTEGER predicates — CV < 0.5 <=> 4(q*n - s^2) <
s^2 and CV < 1 <=> q*n - s^2 < s^2 over exact weekly centiquantity
sums — so class membership has no float surface at all.

Scale contracts: attribution windows run under the per-user
bucketed_map_groups contract; weekly demand reduces through one
(part, week) exchange and classifies in-stream."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away

QUERIES139: dict = {}
ORACLES139: dict = {}

ATTR_WINDOW_US = 3_600_000_000  # 1 hour, the funnel_view_purchase window
WEEK_US = 7 * 86_400_000_000


# ---------------------------------------------------------------------------
# Linear multi-touch attribution
# ---------------------------------------------------------------------------


def q_linear_attribution(sf_dir: str):
    """For every purchase event: the same-user events in the preceding
    hour (exclusive of the purchase itself) share one unit of conversion
    credit equally per the linear attribution model. Emits one row per
    (purchase, contributing event type) with the window size and that
    type's credit share — per-purchase rows, so no float ever crosses a
    reduction. Purchases with an empty window are omitted (stated)."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        et = df["event_type"].to_numpy()
        eid = df["event_id"].to_numpy(np.int64)
        rows = []
        buys = np.nonzero(et == "purchase")[0]
        for b in buys:
            lo = ts[b] - ATTR_WINDOW_US
            j = b - 1
            counts: dict = {}
            k = 0
            while j >= 0 and ts[j] >= lo:
                counts[et[j]] = counts.get(et[j], 0) + 1
                k += 1
                j -= 1
            if k == 0:
                continue
            for t in sorted(counts):
                rows.append(
                    (
                        int(eid[b]),
                        t,
                        k,
                        counts[t],
                        float(
                            _r6away(float(counts[t]) / float(k))
                        ),
                    )
                )
        return pd.DataFrame(
            rows,
            columns=[
                "purchase_event_id",
                "event_type",
                "n_window",
                "n_of_type",
                "credit",
            ],
        ).astype(
            {
                "purchase_event_id": np.int64,
                "n_window": np.int64,
                "n_of_type": np.int64,
            }
        )

    return bucketed_map_groups(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]),
        ["user_id"],
        fn,
    )


ORACLES139["linear_attribution"] = f"""
WITH w AS (
  SELECT p.event_id AS purchase_event_id, e.event_type
  FROM events p
  JOIN events e
    ON e.user_id = p.user_id
   AND (e.ts > p.ts - INTERVAL 1 HOUR OR e.ts = p.ts - INTERVAL 1 HOUR)
   AND (e.ts < p.ts OR (e.ts = p.ts AND e.event_id < p.event_id))
  WHERE p.event_type = 'purchase'
),
k AS (
  SELECT purchase_event_id, COUNT(*) AS n_window FROM w GROUP BY 1
)
SELECT w.purchase_event_id, w.event_type,
       CAST(k.n_window AS BIGINT) AS n_window,
       CAST(COUNT(*) AS BIGINT) AS n_of_type,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(k.n_window AS DOUBLE), 6)
         AS credit
FROM w JOIN k USING (purchase_event_id)
GROUP BY 1, 2, k.n_window
"""


# ---------------------------------------------------------------------------
# XYZ demand-variability classification
# ---------------------------------------------------------------------------


def q_xyz_classification(sf_dir: str):
    """Per part: weekly demand (exact centiquantity over the global
    dense week grid, zeros included), and the XYZ class on the
    coefficient of variation — X steady (CV < 0.5), Y variable
    (CV < 1), Z erratic — via the INTEGER predicates 4(qn - s^2) < s^2
    and qn - s^2 < s^2 (no float in any class decision). The axis
    planners read next to abc_analysis. Parts with zero total demand
    are excluded."""
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        week = (
            batch["l_shipdate"].to_numpy("datetime64[us]").view(np.int64)
            // WEEK_US
        )
        q = batch["l_quantity"].to_numpy(np.float64)
        qc = (np.sign(q * 100) * np.floor(np.abs(q * 100) + 0.5)).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "part": batch["l_partkey"].to_numpy(np.int64),
                    "week": week,
                    "qc": qc,
                }
            )
            .groupby(["part", "week"], sort=False)
            .sum()
            .reset_index()
        )

    weekly = hash_bucket_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        ["part", "week"],
        [("qc", "sum")],
    )
    wlo = int(weekly.min("week"))
    whi = int(weekly.max("week"))
    n_weeks = whi - wlo + 1

    def sums(batch: pd.DataFrame) -> pd.DataFrame:
        qc = batch["qc_sum"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "part": batch["part"].to_numpy(np.int64),
                "s": qc,
                "q": qc * qc,
            }
        )

    agg = (
        hash_bucket_aggregate(
            weekly.map_batches(sums, batch_format="pandas"),
            ["part"],
            [("s", "sum"), ("q", "sum")],
        )
        .to_pandas()
    )
    s = agg["s_sum"].to_numpy(np.int64)
    q = agg["q_sum"].to_numpy(np.int64)
    keep = s > 0
    parts = agg["part"].to_numpy(np.int64)[keep]
    s, q = s[keep], q[keep]
    var_num = q * np.int64(n_weeks) - s * s
    x = 4 * var_num < s * s
    y = (~x) & (var_num < s * s)
    cls = np.where(x, "X", np.where(y, "Y", "Z"))
    return pd.DataFrame(
        {
            "part": parts,
            "n_weeks": np.full(parts.size, n_weeks, dtype=np.int64),
            "total_qc": s,
            "xyz_class": cls,
        }
    )


ORACLES139["xyz_classification"] = """
WITH w AS (
  SELECT l_partkey AS part,
         epoch_us(l_shipdate) // 604800000000 AS week,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
  FROM lineitem GROUP BY 1, 2
),
p AS (SELECT MAX(week) - MIN(week) + 1 AS n_weeks FROM w),
g AS (
  SELECT part, CAST(SUM(qc) AS BIGINT) AS s,
         CAST(SUM(CAST(qc AS HUGEINT) * qc) AS HUGEINT) AS q
  FROM w GROUP BY 1
)
SELECT g.part, CAST(p.n_weeks AS BIGINT) AS n_weeks,
       g.s AS total_qc,
       CASE WHEN 4 * (g.q * p.n_weeks - CAST(g.s AS HUGEINT) * g.s)
                 < CAST(g.s AS HUGEINT) * g.s THEN 'X'
            WHEN (g.q * p.n_weeks - CAST(g.s AS HUGEINT) * g.s)
                 < CAST(g.s AS HUGEINT) * g.s THEN 'Y'
            ELSE 'Z' END AS xyz_class
FROM g CROSS JOIN p
WHERE g.s > 0
"""


QUERIES139["linear_attribution"] = q_linear_attribution
QUERIES139["xyz_classification"] = q_xyz_classification
