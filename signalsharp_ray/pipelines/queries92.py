"""Round-3 batch 94: stability and composition-shift operators — the
overlap of the top-100 users between the window's first and second
half (is the head of the traffic distribution stable), the mean
quantity by lineitem return flag (do bigger shipments come back), and
the chi-square independence of event type vs epoch-week (does the
behaviour mix shift week to week).

House parity: top-k selection orders by (count DESC, user ASC) on
exact integers; half split is the exact (min+max)//2 microsecond
midpoint; quantities are exact rounded integers; chi2 margins are
exact with the standard ascending-key fold.

Scale contracts: per-(user, half) counts reduce through one exchange
with only 2k head rows compared on the driver; the others are bounded
aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES92: dict = {}
ORACLES92: dict = {}

WEEK_US = 7 * 86_400_000_000


# ---------------------------------------------------------------------------
# Top-100 user overlap between window halves
# ---------------------------------------------------------------------------


def q_top_users_overlap(sf_dir: str, k: int = 100):
    """One global row: the top-100 users by event count in each time
    half (split at the exact midpoint of the event span; ties user
    ascending), their overlap count, and the Jaccard of the two head
    sets."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "us": b["ts"].astype("datetime64[us]").astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    bounds = ev.map_batches(
        lambda b: pd.DataFrame(
            {"lo": [int(b["us"].min())], "hi": [int(b["us"].max())]}
        ),
        batch_format="pandas",
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"k": pd.Series(dtype=np.int64),
         "n_overlap": pd.Series(dtype=np.int64),
         "jaccard": pd.Series(dtype=np.float64)}
    )
    if bounds.empty:
        return out_empty
    mid = (int(bounds["lo"].min()) + int(bounds["hi"].max())) // 2

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].astype(np.int64),
                    "half": (batch["us"].astype(np.int64) > mid).astype(
                        np.int64
                    ),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["user_id", "half"], sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        ev.map_batches(tag, batch_format="pandas"),
        ["user_id", "half"],
        [("n", "sum")],
    ).to_pandas()
    tops = {}
    for h in (0, 1):
        g = agg[agg["half"] == h].sort_values(
            ["n_sum", "user_id"], ascending=[False, True]
        )
        tops[h] = set(g["user_id"].head(k).astype(np.int64))
    inter = len(tops[0] & tops[1])
    union = len(tops[0] | tops[1])
    if union == 0:
        return out_empty
    return pd.DataFrame(
        {
            "k": np.array([k], dtype=np.int64),
            "n_overlap": np.array([inter], dtype=np.int64),
            "jaccard": [float(_r6away(float(inter) / float(union)))],
        }
    )


ORACLES92["top_users_overlap"] = """
WITH b AS (SELECT user_id, epoch_us(ts) AS us FROM events),
mid AS (SELECT (MIN(us) + MAX(us)) // 2 AS mid FROM b),
c AS (
  SELECT user_id, CASE WHEN us > mid.mid THEN 1 ELSE 0 END AS half,
         COUNT(*) AS n
  FROM b, mid GROUP BY 1, 2
),
rk AS (
  SELECT user_id, half,
         row_number() OVER (PARTITION BY half
                            ORDER BY n DESC, user_id ASC) AS r
  FROM c
),
t0 AS (SELECT user_id FROM rk WHERE half = 0 AND r <= 100),
t1 AS (SELECT user_id FROM rk WHERE half = 1 AND r <= 100),
i AS (SELECT COUNT(*) AS ni FROM t0 JOIN t1 USING (user_id)),
u AS (
  SELECT COUNT(*) AS nu FROM (
    SELECT user_id FROM t0 UNION SELECT user_id FROM t1
  )
)
SELECT CAST(100 AS BIGINT) AS k,
       CAST(i.ni AS BIGINT) AS n_overlap,
       ROUND(CAST(i.ni AS DOUBLE) / CAST(u.nu AS DOUBLE), 6) AS jaccard
FROM i, u WHERE u.nu > 0
"""


# ---------------------------------------------------------------------------
# Quantity by return flag
# ---------------------------------------------------------------------------


def q_quantity_by_returnflag(sf_dir: str):
    """Per l_returnflag: item count and mean quantity (exact rounded
    integer quantities) — do large shipments return more."""
    li = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(batch["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "flag": batch["l_returnflag"],
                    "n": np.ones(len(q), dtype=np.int64),
                    "s": q,
                }
            )
            .groupby("flag", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            li.map_batches(partial, batch_format="pandas"),
            ["flag"],
            [("n", "sum"), ("s", "sum")],
        )
        .to_pandas()
        .sort_values("flag")
    )
    return pd.DataFrame(
        {
            "returnflag": agg["flag"].astype(str),
            "n_items": agg["n_sum"].astype(np.int64),
            "mean_quantity": _r6away(
                agg["s_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES92["quantity_by_returnflag"] = """
SELECT l_returnflag AS returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_quantity
FROM lineitem GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Type x epoch-week chi-square
# ---------------------------------------------------------------------------


def q_type_week_chi2(sf_dir: str):
    """One global row: chi-square independence of (event_type,
    epoch-aligned week) counts — does the behaviour mix drift across
    weeks. Fold ascends (type, week)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "week": (us // WEEK_US).astype(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["event_type", "week"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "ts"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type", "week"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["event_type", "week"])
    )
    out_empty = pd.DataFrame(
        {"n_events": pd.Series(dtype=np.int64),
         "dof": pd.Series(dtype=np.int64),
         "chi2": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    total = int(agg["n_sum"].sum())
    row = agg.groupby("event_type")["n_sum"].transform("sum").astype(np.int64)
    col_map = agg.groupby("week")["n_sum"].sum().astype(np.int64)
    col = agg["week"].map(col_map).astype(np.int64)
    tf = float(total)
    terms = []
    for o, rx, cy in zip(agg["n_sum"], row, col):
        e = float(int(rx)) * float(int(cy)) / tf
        terms.append((float(int(o)) - e) * (float(int(o)) - e) / e)
    chi2 = _fold(terms)
    nr = int(agg["event_type"].nunique())
    nc = int(agg["week"].nunique())
    return pd.DataFrame(
        {
            "n_events": np.array([total], dtype=np.int64),
            "dof": np.array([(nr - 1) * (nc - 1)], dtype=np.int64),
            "chi2": [float(_r6away(chi2))],
        }
    )


ORACLES92["type_week_chi2"] = """
WITH c AS (
  SELECT event_type, epoch_us(ts) // 604800000000 AS week, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, week, n,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS r,
         CAST(SUM(n) OVER (PARTITION BY week) AS BIGINT) AS cl,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM c
)
SELECT CAST(MAX(total) AS BIGINT) AS n_events,
       CAST((COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT week) - 1)
            AS BIGINT) AS dof,
       ROUND(list_sum(list(
         (CAST(n AS DOUBLE)
          - CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         * (CAST(n AS DOUBLE)
            - CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         / (CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         ORDER BY event_type, week)), 6) AS chi2
FROM w
"""


QUERIES92["top_users_overlap"] = q_top_users_overlap
QUERIES92["quantity_by_returnflag"] = q_quantity_by_returnflag
QUERIES92["type_week_chi2"] = q_type_week_chi2
