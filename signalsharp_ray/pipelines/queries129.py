"""Round-4 batch 129: ingestion-audit and capacity statistics — the
exact-duplicate event audit (multiplicity histogram over identical
(ts, user, type, value) rows — double-ingestion shows up here first),
the value-precision audit (decimal-places mix per type — a precision
cliff means an upstream cast), the crest factor (peak-to-mean ratio of
hourly load — the capacity-headroom number), and dense-grid sparsity
(the zero-hour share gap-fill will have to synthesize).

House parity: duplicate multiplicities, precision classes (centivalue
mod 100/10), peak/mean ingredients and present/zero hour counts are all
exact integers; each query's single float is one shared division.

Scale contracts: duplicate groups reduce through one exchange keyed on
the full row fingerprint (the exact_dedup shape); precision and crest
partials pre-reduce in-batch; grid folds are retention-bounded."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries6 import HOUR_US, _hourly_counts
from .queries8 import _dense_by_type

QUERIES129: dict = {}
ORACLES129: dict = {}


# ---------------------------------------------------------------------------
# Exact-duplicate event audit
# ---------------------------------------------------------------------------


def q_event_duplicate_audit(sf_dir: str):
    """Multiplicity histogram of events identical on
    (ts, user_id, event_type, value): how many distinct row-groups occur
    exactly m times, and how many excess rows (m - 1 per group) a
    dedup pass would drop. All integers; the group fingerprint crosses
    ONE exchange (the exact_dedup contract — never the raw text of
    anything)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "ts_us": batch["ts"]
                    .to_numpy("datetime64[us]")
                    .view(np.int64),
                    "user_id": batch["user_id"].to_numpy(np.int64),
                    "event_type": batch["event_type"],
                    "cval": c,
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["ts_us", "user_id", "event_type", "cval"], sort=False)
            .sum()
            .reset_index()
        )

    groups = hash_bucket_aggregate(
        _events(sf_dir, ["ts", "user_id", "event_type", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["ts_us", "user_id", "event_type", "cval"],
        [("n", "sum")],
    )

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "multiplicity": batch["n_sum"].to_numpy(np.int64),
                    "n_groups": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby("multiplicity", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        groups.map_batches(hist, batch_format="pandas"),
        ["multiplicity"],
        [("n_groups", "sum")],
    ).to_pandas()
    m = agg["multiplicity"].to_numpy(np.int64)
    g = agg["n_groups_sum"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "multiplicity": m,
            "n_groups": g,
            "excess_rows": (m - 1) * g,
        }
    )


ORACLES129["event_duplicate_audit"] = """
WITH g AS (
  SELECT ts, user_id, event_type,
         CAST(ROUND(value * 100) AS BIGINT) AS cval, COUNT(*) AS m
  FROM events GROUP BY 1, 2, 3, 4
)
SELECT CAST(m AS BIGINT) AS multiplicity,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST((m - 1) * COUNT(*) AS BIGINT) AS excess_rows
FROM g GROUP BY m
"""


# ---------------------------------------------------------------------------
# Value-precision audit
# ---------------------------------------------------------------------------


def q_value_precision_audit(sf_dir: str):
    """Per event_type: how many values are whole units, one-decimal, or
    full two-decimal cents (centivalue mod 100 / mod 10) — a precision
    mix that shifts over time means an upstream producer changed its
    cast. Integer counts, one shared share division."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        whole = (c % 100 == 0).astype(np.int64)
        tenth = ((c % 10 == 0) & (c % 100 != 0)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "n": np.ones(len(batch), dtype=np.int64),
                    "whole": whole,
                    "tenth": tenth,
                }
            )
            .groupby("event_type", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type"],
        [("n", "sum"), ("whole", "sum"), ("tenth", "sum")],
    ).to_pandas()
    n = agg["n_sum"].to_numpy(np.int64)
    w = agg["whole_sum"].to_numpy(np.int64)
    t = agg["tenth_sum"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "event_type": agg["event_type"].to_numpy(),
            "n_events": n,
            "n_whole": w,
            "n_tenth": t,
            "n_cents": n - w - t,
            "cents_share": _r6away(
                (n - w - t).astype(np.float64) / n.astype(np.float64)
            ),
        }
    )


ORACLES129["value_precision_audit"] = """
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
g AS (
  SELECT event_type, COUNT(*) AS n,
         COUNT(*) FILTER (WHERE c % 100 = 0) AS whole,
         COUNT(*) FILTER (WHERE c % 10 = 0 AND c % 100 <> 0) AS tenth
  FROM b GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       CAST(whole AS BIGINT) AS n_whole,
       CAST(tenth AS BIGINT) AS n_tenth,
       CAST(n - whole - tenth AS BIGINT) AS n_cents,
       ROUND(CAST(n - whole - tenth AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS cents_share
FROM g
"""


# ---------------------------------------------------------------------------
# Crest factor of hourly load
# ---------------------------------------------------------------------------


def q_crest_factor(sf_dir: str):
    """Per event_type over the dense hourly grid: the peak hour's count,
    the total, and the crest factor peak/(total/n) = peak*n/total — the
    capacity-headroom multiple ("provision 4.2x the average"). One
    transcribed float expression over exact integers; all-zero series
    are excluded on both sides."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    rows = []
    for ti, t in enumerate(types):
        v = mat[ti]
        s = int(v.sum())
        if s == 0:
            continue
        peak = int(v.max())
        crest = float(peak) * float(n) / float(s)
        rows.append((t, n, peak, s, float(_r6away(crest))))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_hours", "peak_count", "total", "crest"],
    ).astype(
        {"n_hours": np.int64, "peak_count": np.int64, "total": np.int64}
    )


ORACLES129["dense_crest_factor"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
types AS (SELECT DISTINCT event_type FROM h),
dense AS (
  SELECT t.event_type, g.bh, CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
s AS (
  SELECT event_type, COUNT(*) AS n_hours, MAX(x) AS peak, SUM(x) AS total
  FROM dense GROUP BY 1
)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
       CAST(peak AS BIGINT) AS peak_count,
       CAST(total AS BIGINT) AS total,
       ROUND(CAST(peak AS DOUBLE) * CAST(n_hours AS DOUBLE)
             / CAST(total AS DOUBLE), 6) AS crest
FROM s WHERE total > 0
"""


# ---------------------------------------------------------------------------
# Dense-grid sparsity
# ---------------------------------------------------------------------------


def q_grid_sparsity(sf_dir: str):
    """Per event_type: how many dense-grid hours are PRESENT vs zero —
    the fraction of the tier gap-fill must synthesize (high sparsity
    argues for LOCF over linear). Pure integers, one shared division."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    rows = []
    for ti, t in enumerate(types):
        present = int((mat[ti] > 0).sum())
        rows.append(
            (
                t,
                n,
                present,
                n - present,
                float(_r6away(float(n - present) / float(n))),
            )
        )
    return pd.DataFrame(
        rows,
        columns=[
            "event_type",
            "n_hours",
            "n_present",
            "n_zero",
            "sparsity",
        ],
    ).astype(
        {"n_hours": np.int64, "n_present": np.int64, "n_zero": np.int64}
    )


ORACLES129["grid_sparsity"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
types AS (SELECT DISTINCT event_type FROM h),
dense AS (
  SELECT t.event_type, g.bh, CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
       CAST(COUNT(*) FILTER (WHERE x > 0) AS BIGINT) AS n_present,
       CAST(COUNT(*) FILTER (WHERE x = 0) AS BIGINT) AS n_zero,
       ROUND(CAST(COUNT(*) FILTER (WHERE x = 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS sparsity
FROM dense GROUP BY 1
"""


QUERIES129["event_duplicate_audit"] = q_event_duplicate_audit
QUERIES129["value_precision_audit"] = q_value_precision_audit
QUERIES129["dense_crest_factor"] = q_crest_factor
QUERIES129["grid_sparsity"] = q_grid_sparsity
