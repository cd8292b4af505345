"""Round-3 batch 91: retention-ladder extension and mix profiles — the
CALENDAR-MONTH rollup cascaded exactly through 1m -> 1h -> 1d -> month
(the variable-width rung the epoch-aligned 1w tier cannot express),
the mean discount by part type (dimension-join pricing profile), and
the hour-of-day entropy per event_type (how spread each behaviour's
diurnal activity is).

House parity: the month cascade merges exact int64 count/sum/min/max
from the verified daily tier (months partition whole days, so the
cascade is exact); month starts are datetime64[M] truncation ==
date_trunc('month'); discounts are exact basis points; entropies fold
ln over integer shares ascending hod.

Scale contracts: the cascade is one more bounded exchange over tier
rows (never raw points); the discount profile broadcasts the part
dimension; entropy is a types x 24 aggregate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from ..stages.rollup import cascade_tier, rollup_tier
from .queries2 import _events, _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES89: dict = {}
ORACLES89: dict = {}

HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# Calendar-month cascade
# ---------------------------------------------------------------------------


def q_rollup_1mo_cascade(sf_dir: str):
    """Monthly retention tier cascaded exactly through the ladder
    1m -> 1h -> 1d -> calendar month: count / sum / min / max merge
    associatively over int64 centivalues; the mean reconstructs once.
    Calendar months are the one variable-width tier — they partition
    whole days, so cascading from the daily tier stays exact."""
    from .queries import _events_v100

    t1m = rollup_tier(_events_v100(sf_dir), "1m", key_cols=["event_type"])
    t1h = cascade_tier(t1m, "1h", key_cols=["event_type"])
    t1d = cascade_tier(t1h, "1d", key_cols=["event_type"])

    def to_month(batch: pd.DataFrame) -> pd.DataFrame:
        month = (
            batch["bucket_ts"]
            .astype("datetime64[us]")
            .to_numpy()
            .astype("datetime64[M]")
            .astype("datetime64[us]")
        )
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "bucket_ts": month,
                "count": batch["count"].astype(np.int64),
                "sum": batch["sum"].astype(np.int64),
                "min": batch["min"].astype(np.int64),
                "max": batch["max"].astype(np.int64),
            }
        )

    monthly = hash_bucket_aggregate(
        t1d.map_batches(to_month, batch_format="pandas"),
        ["event_type", "bucket_ts"],
        [("count", "sum"), ("sum", "sum"), ("min", "min"), ("max", "max")],
    )

    def fmt(batch: pd.DataFrame) -> pd.DataFrame:
        cnt = batch["count_sum"].astype(np.int64)
        sum_d = batch["sum_sum"].to_numpy(np.float64) / 100.0
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "bucket_ts": batch["bucket_ts"].astype("datetime64[us]"),
                "cnt": cnt,
                "sum_value": _r6away(sum_d),
                "min_value": _r6away(
                    batch["min_min"].to_numpy(np.float64) / 100.0
                ),
                "max_value": _r6away(
                    batch["max_max"].to_numpy(np.float64) / 100.0
                ),
                "mean_value": _r6away(sum_d / cnt.to_numpy()),
            }
        )

    return monthly.map_batches(fmt, batch_format="pandas")


ORACLES89["rollup_1mo_cascade"] = """
WITH v AS (
  SELECT event_type, date_trunc('month', ts) AS bucket_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS v100
  FROM events
)
SELECT event_type, bucket_ts,
       COUNT(*) AS cnt,
       ROUND(CAST(SUM(v100) AS DOUBLE) / 100, 6) AS sum_value,
       ROUND(CAST(MIN(v100) AS DOUBLE) / 100, 6) AS min_value,
       ROUND(CAST(MAX(v100) AS DOUBLE) / 100, 6) AS max_value,
       ROUND(CAST(SUM(v100) AS DOUBLE) / 100 / COUNT(*), 6) AS mean_value
FROM v GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Mean discount by part type
# ---------------------------------------------------------------------------


def q_discount_by_part_type(sf_dir: str):
    """Per p_type: item count and mean discount percent — which
    catalog categories get discounted. Exact basis points.

    Scale shape: lineitem pre-reduces per partkey (only |part| rows
    cross the join exchange), the part type attaches via one
    co-partitioned bucketed_join — never a driver dict (part is O(sf)),
    and the 150-type combine is bounded."""
    from ..common.raytools import bucketed_join

    per_key = hash_bucket_aggregate(
        _read(sf_dir, "lineitem", ["l_partkey", "l_discount"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "partkey": b["l_partkey"].astype(np.int64),
                    "n": np.ones(len(b), dtype=np.int64),
                    "bp": np.rint(
                        b["l_discount"].to_numpy(np.float64) * 10000
                    ).astype(np.int64),
                }
            )
            .groupby("partkey", sort=False)
            .sum()
            .reset_index(),
            batch_format="pandas",
        ),
        ["partkey"],
        [("n", "sum"), ("bp", "sum")],
    )
    dim = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["p_partkey"].astype(np.int64),
                "p_type": b["p_type"].astype(str),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_key, dim, on=["partkey"])

    def by_type(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "p_type": batch["p_type"].astype(str),
                    "n": batch["n_sum"].astype(np.int64),
                    "bp": batch["bp_sum"].astype(np.int64),
                }
            )
            .groupby("p_type", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        joined.map_batches(by_type, batch_format="pandas")
        .to_pandas()
        .groupby("p_type", sort=True)
        .sum()
        .reset_index()
        .rename(columns={"n": "n_sum", "bp": "bp_sum"})
        .sort_values("p_type")
    )
    return pd.DataFrame(
        {
            "p_type": agg["p_type"].astype(str),
            "n_items": agg["n_sum"].astype(np.int64),
            "mean_discount_pct": _r6away(
                agg["bp_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
                / 100.0
            ),
        }
    ).reset_index(drop=True)


ORACLES89["discount_by_part_type"] = """
SELECT p.p_type,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(ROUND(l.l_discount * 10000) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS mean_discount_pct
FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Hour-of-day entropy per event_type
# ---------------------------------------------------------------------------


def q_hod_entropy_by_type(sf_dir: str):
    """Per event_type: Shannon entropy (nats) of the hour-of-day event
    distribution and its normalized (0-1, /ln 24) form — spread vs
    peaked diurnal behaviour. Folds ascend hod."""
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
    agg = (
        hash_bucket_aggregate(ev, ["event_type", "hod"], [("n", "sum")])
        .to_pandas()
        .sort_values(["event_type", "hod"])
    )
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        tot = int(g["n_sum"].sum())
        terms = []
        for _, r in g.iterrows():
            p = float(int(r["n_sum"])) / float(tot)
            terms.append(p * math.log(p))
        e = -_fold(terms)
        rows.append(
            (et, tot, float(_r6away(e)),
             float(_r6away(e / math.log(24.0))))
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_events", "entropy", "entropy_norm"]
    ).astype({"n_events": np.int64})


ORACLES89["hod_entropy_by_type"] = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, SUM(n) AS tot FROM c GROUP BY 1)
SELECT c.event_type,
       CAST(MAX(t.tot) AS BIGINT) AS n_events,
       ROUND(-list_sum(list(
         (CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         ORDER BY c.hod)), 6) AS entropy,
       ROUND(-list_sum(list(
         (CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         ORDER BY c.hod)) / ln(24.0), 6) AS entropy_norm
FROM c JOIN t USING (event_type)
GROUP BY c.event_type
"""


QUERIES89["rollup_1mo_cascade"] = q_rollup_1mo_cascade
QUERIES89["discount_by_part_type"] = q_discount_by_part_type
QUERIES89["hod_entropy_by_type"] = q_hod_entropy_by_type
