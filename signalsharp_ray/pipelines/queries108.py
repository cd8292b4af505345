"""Round-3 batch 110: loyalty, sparsity, and value-phase operators —
the mean share of a user's events in their single favourite type
(behavioural loyalty, the type-axis twin of user_peak_hour_share), the
sparsity of the embedding table (share of exactly-zero micro-unit
components), and the value-weighted peak hour per type (where the
MONEY concentrates, vs the count peak).

House parity: loyalty folds user-ascending exact ratios; sparsity is
an exact integer predicate over quantized components; value peaks
select (centivalue sum DESC, hod ASC) on exact integers.

Scale contracts: all three pre-reduce through one exchange with
bounded outputs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries14 import _fold

QUERIES108: dict = {}
ORACLES108: dict = {}

HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# User type loyalty
# ---------------------------------------------------------------------------


def q_user_type_loyalty(sf_dir: str):
    """One global row: over users with >= 5 events, the mean share of
    their events in their modal event type."""
    ev = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "event_type": b["event_type"],
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby(["user_id", "event_type"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        ev, ["user_id", "event_type"], [("n", "sum")]
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"n_users": pd.Series(dtype=np.int64),
         "mean_loyalty": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    per_user = agg.groupby("user_id")["n_sum"].agg(["sum", "max"])
    per_user = per_user[per_user["sum"] >= 5].sort_index()
    k = len(per_user)
    if k == 0:
        return out_empty
    shares = [
        float(int(mx)) / float(int(tot))
        for tot, mx in zip(per_user["sum"], per_user["max"])
    ]
    return pd.DataFrame(
        {
            "n_users": np.array([k], dtype=np.int64),
            "mean_loyalty": [float(_r6away(_fold(shares) / float(k)))],
        }
    )


ORACLES108["user_type_loyalty"] = """
WITH c AS (
  SELECT user_id, event_type, COUNT(*) AS n FROM events GROUP BY 1, 2
),
u AS (
  SELECT user_id, SUM(n) AS tot, MAX(n) AS mx
  FROM c GROUP BY 1 HAVING SUM(n) >= 5
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(list_sum(list(CAST(mx AS DOUBLE) / CAST(tot AS DOUBLE)
                           ORDER BY user_id))
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_loyalty
FROM u
"""


# ---------------------------------------------------------------------------
# Embedding sparsity
# ---------------------------------------------------------------------------


def q_embedding_sparsity(sf_dir: str):
    """One global row: total micro-unit components, exact zeros, and
    the zero share — is the embedding space truly dense."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(batch["embedding"].to_numpy()).astype(np.float64)
        y = mat * 1e6
        q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        return pd.DataFrame(
            {
                "n": np.array([q.size], dtype=np.int64),
                "z": np.array([int((q == 0).sum())], dtype=np.int64),
            }
        )

    parts = ds.map_batches(partial, batch_format="pandas").to_pandas()
    out_empty = pd.DataFrame(
        {"n_components": pd.Series(dtype=np.int64),
         "n_zero": pd.Series(dtype=np.int64),
         "zero_share": pd.Series(dtype=np.float64)}
    )
    n = int(parts["n"].sum()) if len(parts) else 0
    if n == 0:
        return out_empty
    z = int(parts["z"].sum())
    return pd.DataFrame(
        {
            "n_components": np.array([n], dtype=np.int64),
            "n_zero": np.array([z], dtype=np.int64),
            "zero_share": [float(_r6away(float(z) / float(n)))],
        }
    )


ORACLES108["embedding_sparsity"] = """
WITH e AS (
  SELECT CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS q
  FROM embeddings
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
       CAST(COUNT(*) FILTER (WHERE q = 0) AS BIGINT) AS n_zero,
       ROUND(CAST(COUNT(*) FILTER (WHERE q = 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS zero_share
FROM e
"""


# ---------------------------------------------------------------------------
# Value-weighted peak hour per type
# ---------------------------------------------------------------------------


def q_value_peak_hour_by_type(sf_dir: str):
    """Per event_type: the hour-of-day carrying the largest centivalue
    sum (sum DESC, hod ASC), its share of the type's value, and the
    count-peak hour for contrast."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "hod": ((us // HOUR_US) % 24).astype(np.int64),
                    "s": _cents(batch["value"]),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["event_type", "hod"], sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "hod"],
        [("s", "sum"), ("n", "sum")],
    ).to_pandas()
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        tot = int(g["s_sum"].sum())
        if tot == 0:
            continue
        gv = g.sort_values(["s_sum", "hod"], ascending=[False, True])
        gc = g.sort_values(["n_sum", "hod"], ascending=[False, True])
        rows.append(
            (
                et,
                int(gv["hod"].iloc[0]),
                float(_r6away(float(int(gv["s_sum"].iloc[0])) / float(tot))),
                int(gc["hod"].iloc[0]),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "value_peak_hod", "value_peak_share",
                 "count_peak_hod"],
    ).astype({"value_peak_hod": np.int64, "count_peak_hod": np.int64})


ORACLES108["value_peak_hour_by_type"] = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(SUM(s) AS BIGINT) AS tot FROM c GROUP BY 1),
vp AS (
  SELECT event_type, hod, s FROM c
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY s DESC, hod ASC) = 1
),
cp AS (
  SELECT event_type, hod FROM c
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY n DESC, hod ASC) = 1
)
SELECT vp.event_type,
       CAST(vp.hod AS BIGINT) AS value_peak_hod,
       ROUND(CAST(vp.s AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
         AS value_peak_share,
       CAST(cp.hod AS BIGINT) AS count_peak_hod
FROM vp
JOIN t USING (event_type)
JOIN cp USING (event_type)
WHERE t.tot != 0
"""


QUERIES108["user_type_loyalty"] = q_user_type_loyalty
QUERIES108["embedding_sparsity"] = q_embedding_sparsity
QUERIES108["value_peak_hour_by_type"] = q_value_peak_hour_by_type
