"""Round-3 batch 98: boilerplate, concurrency, and shape-of-population
operators — the prefix-duplication share per source (docs whose 32-char
opening is shared with another doc — template/boilerplate detection
upstream of the shingle dedup), the peak and mean hourly unique-user
counts (concurrency profile), and the bimodality coefficient of the
per-user event-count distribution ((skew^2 + 1) / kurtosis — does the
user base split into casual and power users).

House parity: prefix sharing is exact distinct counting over raw
32-char slices; unique-user counts are exact per-hour distincts with
an hod-ascending mean fold; bimodality combines exact integer power
sums (Python big ints == HUGEINT) in one transcribed expression.

Scale contracts: prefixes collapse per (prefix) through one exchange;
hourly distincts pre-dedup (hour, user) pairs; moments are a
partial+final reduce over per-user counts.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries14 import _fold

QUERIES96: dict = {}
ORACLES96: dict = {}

HOUR_US = 3_600_000_000
PREFIX_LEN = 32


# ---------------------------------------------------------------------------
# Prefix-duplication share per source
# ---------------------------------------------------------------------------


def q_prefix_dup_share(sf_dir: str):
    """Per source: docs whose first 32 characters are shared by >= 2
    docs corpus-wide (cross-source sharing counts), and the share."""
    docs = _documents(sf_dir, ["doc_id", "source", "text"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype(np.int64),
                "source": b["source"],
                "prefix": b["text"].fillna("").str.slice(0, PREFIX_LEN),
            }
        ),
        batch_format="pandas",
    )
    pc = hash_bucket_aggregate(
        docs.map_batches(
            lambda b: pd.DataFrame(
                {
                    "prefix": b["prefix"],
                    "n": np.ones(len(b), dtype=np.int64),
                }
            )
            .groupby("prefix", sort=False)
            .sum()
            .reset_index(),
            batch_format="pandas",
        ),
        ["prefix"],
        [("n", "sum")],
    ).to_pandas()
    shared = set(pc.loc[pc["n_sum"] >= 2, "prefix"])

    def tag(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "n": np.ones(len(batch), dtype=np.int64),
                    "dup": batch["prefix"].isin(shared).astype(np.int64),
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            docs.map_batches(tag, batch_format="pandas"),
            ["source"],
            [("n", "sum"), ("dup", "sum")],
        )
        .to_pandas()
        .sort_values("source")
    )
    return pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "n_docs": agg["n_sum"].astype(np.int64),
            "n_shared_prefix": agg["dup_sum"].astype(np.int64),
            "shared_share": _r6away(
                agg["dup_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES96["prefix_dup_share"] = """
WITH p AS (
  SELECT source, substr(COALESCE(text, ''), 1, 32) AS prefix
  FROM documents
),
pc AS (SELECT prefix, COUNT(*) AS n FROM p GROUP BY 1)
SELECT p.source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (WHERE pc.n >= 2) AS BIGINT) AS n_shared_prefix,
       ROUND(CAST(COUNT(*) FILTER (WHERE pc.n >= 2) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS shared_share
FROM p JOIN pc USING (prefix)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Hourly unique-user peak
# ---------------------------------------------------------------------------


def q_hourly_unique_users_peak(sf_dir: str):
    """One global row: the calendar hour with the most distinct active
    users (ties earliest hour), its user count, and the mean distinct
    users per active hour (hour-ascending fold)."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "hour": (
                    b["ts"].astype("datetime64[us]").astype("int64") // HOUR_US
                ).astype(np.int64),
                "user_id": b["user_id"].astype(np.int64),
                "one": np.ones(len(b), dtype=np.int64),
            }
        ).drop_duplicates(subset=["hour", "user_id"]),
        batch_format="pandas",
    )
    per_hour = (
        hash_bucket_aggregate(
            hash_bucket_aggregate(
                ev, ["hour", "user_id"], [("one", "max")]
            ).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "hour": b["hour"].astype(np.int64),
                        "u": np.ones(len(b), dtype=np.int64),
                    }
                )
                .groupby("hour", sort=False)
                .sum()
                .reset_index(),
                batch_format="pandas",
            ),
            ["hour"],
            [("u", "sum")],
        )
        .to_pandas()
        .sort_values("hour")
    )
    out_empty = pd.DataFrame(
        {"n_hours": pd.Series(dtype=np.int64),
         "peak_hour_us": pd.Series(dtype=np.int64),
         "peak_users": pd.Series(dtype=np.int64),
         "mean_users": pd.Series(dtype=np.float64)}
    )
    if per_hour.empty:
        return out_empty
    best_h = -1
    best_u = -1
    for h, u in zip(per_hour["hour"], per_hour["u_sum"]):
        if int(u) > best_u:
            best_u = int(u)
            best_h = int(h)
    n = len(per_hour)
    mean = _fold([float(int(u)) for u in per_hour["u_sum"]]) / float(n)
    return pd.DataFrame(
        {
            "n_hours": np.array([n], dtype=np.int64),
            "peak_hour_us": np.array([best_h * HOUR_US], dtype=np.int64),
            "peak_users": np.array([best_u], dtype=np.int64),
            "mean_users": [float(_r6away(mean))],
        }
    )


ORACLES96["hourly_unique_users_peak"] = """
WITH h AS (
  SELECT epoch_us(ts) // 3600000000 AS hour,
         COUNT(DISTINCT user_id) AS u
  FROM events GROUP BY 1
),
peak AS (
  SELECT hour, u FROM h
  QUALIFY row_number() OVER (ORDER BY u DESC, hour ASC) = 1
),
m AS (
  SELECT COUNT(*) AS n,
         list_sum(list(CAST(u AS DOUBLE) ORDER BY hour)) AS s
  FROM h
)
SELECT CAST(m.n AS BIGINT) AS n_hours,
       CAST(peak.hour * 3600000000 AS BIGINT) AS peak_hour_us,
       CAST(peak.u AS BIGINT) AS peak_users,
       ROUND(m.s / CAST(m.n AS DOUBLE), 6) AS mean_users
FROM peak, m
"""


# ---------------------------------------------------------------------------
# Bimodality of per-user event counts
# ---------------------------------------------------------------------------


def q_user_count_bimodality(sf_dir: str):
    """One global row: Sarle's bimodality coefficient
    (skew^2 + 1) / kurtosis (non-excess) of the per-user event-count
    distribution — above ~0.555 hints at a casual/power-user split.
    Exact integer power sums (Python big ints == HUGEINT)."""
    per_user = (
        hash_bucket_aggregate(
            _events(sf_dir, ["user_id"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "user_id": b["user_id"].astype(np.int64),
                        "n": np.ones(len(b), dtype=np.int64),
                    }
                )
                .groupby("user_id", sort=False)
                .sum()
                .reset_index(),
                batch_format="pandas",
            ),
            ["user_id"],
            [("n", "sum")],
        )
        .to_pandas()
    )
    out_empty = pd.DataFrame(
        {"n_users": pd.Series(dtype=np.int64),
         "skewness": pd.Series(dtype=np.float64),
         "kurtosis": pd.Series(dtype=np.float64),
         "bimodality": pd.Series(dtype=np.float64)}
    )
    k = len(per_user)
    if k < 2:
        return out_empty
    c = [int(x) for x in per_user["n_sum"]]
    s1 = sum(c)
    s2 = sum(x * x for x in c)
    s3 = sum(x * x * x for x in c)
    s4 = sum(x * x * x * x for x in c)
    m = float(s1) / k
    m2 = float(s2) / k - m * m
    if m2 <= 0.0:
        return out_empty
    m3 = float(s3) / k - 3.0 * m * (float(s2) / k) + 2.0 * m * m * m
    m4 = (
        float(s4) / k
        - 4.0 * m * (float(s3) / k)
        + 6.0 * m * m * (float(s2) / k)
        - 3.0 * m * m * m * m
    )
    skew = m3 / (m2 * math.sqrt(m2))
    kurt = m4 / (m2 * m2)
    return pd.DataFrame(
        {
            "n_users": np.array([k], dtype=np.int64),
            "skewness": [float(_r6away(skew))],
            "kurtosis": [float(_r6away(kurt))],
            "bimodality": [float(_r6away((skew * skew + 1.0) / kurt))],
        }
    )


ORACLES96["user_count_bimodality"] = """
WITH pu AS (
  SELECT user_id, COUNT(*) AS c FROM events GROUP BY 1
),
s AS (
  SELECT COUNT(*) AS k,
         CAST(SUM(c) AS BIGINT) AS s1,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS s2,
         CAST(SUM(CAST(c AS HUGEINT) * c * c) AS HUGEINT) AS s3,
         CAST(SUM(CAST(c AS HUGEINT) * c * c * c) AS HUGEINT) AS s4
  FROM pu
),
f AS (
  SELECT k,
         CAST(s1 AS DOUBLE) / k AS m,
         CAST(s2 AS DOUBLE) / k
           - (CAST(s1 AS DOUBLE) / k) * (CAST(s1 AS DOUBLE) / k) AS m2,
         CAST(s2 AS DOUBLE) / k AS r2,
         CAST(s3 AS DOUBLE) / k AS r3,
         CAST(s4 AS DOUBLE) / k AS r4
  FROM s WHERE k >= 2
),
g AS (
  SELECT k,
         (r3 - 3.0 * m * r2 + 2.0 * m * m * m) / (m2 * sqrt(m2)) AS skew,
         (r4 - 4.0 * m * r3 + 6.0 * m * m * r2 - 3.0 * m * m * m * m)
           / (m2 * m2) AS kurt
  FROM f WHERE m2 > 0
)
SELECT CAST(k AS BIGINT) AS n_users,
       ROUND(skew, 6) AS skewness,
       ROUND(kurt, 6) AS kurtosis,
       ROUND((skew * skew + 1.0) / kurt, 6) AS bimodality
FROM g
"""


QUERIES96["prefix_dup_share"] = q_prefix_dup_share
QUERIES96["hourly_unique_users_peak"] = q_hourly_unique_users_peak
QUERIES96["user_count_bimodality"] = q_user_count_bimodality
