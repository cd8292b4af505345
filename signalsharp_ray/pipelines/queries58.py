"""Round-3 batch 60: intensity and vector-dedup diagnostics — mean
events per active day per user (how hard the average user hits the
system on days they show up — the intensity complement of
active_days_histogram), and the embedding duplicate-vector rate
(exactly identical quantized vectors — the embedding-space twin of
exact_dedup).

House parity: per-user intensities are exact-integer ratios folded
over ascending user_id; duplicate detection groups the FULL quantized
integer vector (Python tuple key == DuckDB list group key — integer
equality has no float surface).

Scale contracts: per-user counts are one exchange (driver fold under
the hill/gini contract); vector grouping moves one int-list row per
distinct signature.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _quantize_rows
from .queries14 import _fold

QUERIES58: dict = {}
ORACLES58: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Mean per-user daily intensity
# ---------------------------------------------------------------------------


def q_user_intensity_mean(sf_dir: str):
    """Mean over users of (total events / active days) — when users do
    show up, how much do they do. Both counts reduce in one (user)
    exchange with a (user, day) dedup; the per-user ratio fold runs
    over ascending user_id."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
            }
        ),
        batch_format="pandas",
    )
    events_per_user = hash_bucket_aggregate(
        ev.map_batches(
            lambda b: b.groupby("user_id", sort=False)
            .size()
            .reset_index(name="n")
            .astype({"n": np.int64}),
            batch_format="pandas",
        ),
        ["user_id"],
        [("n", "sum")],
    ).to_pandas()
    days_per_user = (
        hash_bucket_aggregate(
            hash_bucket_aggregate(
                ev.map_batches(
                    lambda b: b.drop_duplicates().assign(
                        one=lambda d: np.ones(len(d), dtype=np.int64)
                    ),
                    batch_format="pandas",
                ),
                ["user_id", "day_us"],
                [("one", "max")],
            ).map_batches(
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
        .to_pandas()
        .set_index("user_id")["d_sum"]
        .astype(np.int64)
    )
    merged = events_per_user.sort_values("user_id")
    ratios = [
        float(int(n)) / float(int(days_per_user[int(u)]))
        for u, n in zip(merged["user_id"], merged["n_sum"])
    ]
    m = len(ratios)
    mean_int = _fold(ratios) / float(m)
    return pd.DataFrame(
        {
            "n_users": np.array([m], dtype=np.int64),
            "mean_intensity": [float(_r6away(mean_int))],
        }
    )


ORACLES58["user_intensity_mean"] = """
WITH u AS (
  SELECT user_id,
         CAST(COUNT(*) AS DOUBLE)
           / CAST(COUNT(DISTINCT date_trunc('day', ts)) AS DOUBLE) AS r
  FROM events GROUP BY 1
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(list_sum(list(r ORDER BY user_id))
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_intensity
FROM u
"""


# ---------------------------------------------------------------------------
# Embedding duplicate-vector rate
# ---------------------------------------------------------------------------


def q_embedding_dup_rate(sf_dir: str):
    """How many embeddings are EXACT duplicates of another after int8
    quantization: distinct signatures, duplicated rows, and the dup
    rate — the vector-space exact_dedup. Signature grouping is pure
    integer tuple equality on both engines."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = _quantize_rows(batch["embedding"])
        keys: dict = {}
        for row in q:
            k = row.tobytes()
            keys[k] = keys.get(k, 0) + 1
        return pd.DataFrame(
            {
                "sig": [k.hex() for k in keys],
                "n": np.array(list(keys.values()), dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pandas"), ["sig"], [("n", "sum")]
    ).to_pandas()
    n_vecs = int(agg["n_sum"].sum())
    n_distinct = int(len(agg))
    dups = n_vecs - n_distinct
    return pd.DataFrame(
        {
            "n_vecs": np.array([n_vecs], dtype=np.int64),
            "n_distinct": np.array([n_distinct], dtype=np.int64),
            "n_duplicates": np.array([dups], dtype=np.int64),
            "dup_rate": [float(_r6away(float(dups) / float(n_vecs)))],
        }
    )


ORACLES58["embedding_dup_rate"] = """
WITH m AS (
  SELECT embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS ma
  FROM embeddings
),
q AS (
  SELECT list_transform(embedding,
           x -> CASE WHEN ma = 0 THEN 0
                     ELSE CAST(ROUND(CAST(x AS DOUBLE) / CAST(ma AS DOUBLE) * 127)
                               AS BIGINT) END) AS qv
  FROM m
),
g AS (SELECT qv, COUNT(*) AS n FROM q GROUP BY 1),
a AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_vecs,
         COUNT(*) AS n_distinct
  FROM g
)
SELECT n_vecs,
       CAST(n_distinct AS BIGINT) AS n_distinct,
       CAST(n_vecs - n_distinct AS BIGINT) AS n_duplicates,
       ROUND(CAST(n_vecs - n_distinct AS DOUBLE) / CAST(n_vecs AS DOUBLE), 6)
         AS dup_rate
FROM a
"""


QUERIES58["user_intensity_mean"] = q_user_intensity_mean
QUERIES58["embedding_dup_rate"] = q_embedding_dup_rate
