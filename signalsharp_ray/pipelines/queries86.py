"""Round-3 batch 88: distribution-asymmetry operators — the 10 most
skewed embedding dimensions (per-dim skewness over micro-unit
integers; the moment companion to top_variance_dims), the histogram of
per-user weekend-activity preference (how many users do 0-10%%, ...,
90-100%% of their events on weekends), and the mean lineitem value by
line number (do later lines in an order carry smaller items).

House parity: dim skewness uses exact integer power sums (Python big
ints == SQL HUGEINT cubes) with the shared m3/(m2*sqrt(m2))
combination and (|skew| DESC, dim ASC) selection on bitwise-identical
floats; preference bands are exact integer floor divisions
(10 * weekend) // total; line-number means are exact cents.

Scale contracts: dim sums reduce per (dim) through one exploded
exchange; the preference histogram pre-reduces per user then bands;
line-number means are a bounded partial+final.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES86: dict = {}
ORACLES86: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Most-skewed embedding dimensions
# ---------------------------------------------------------------------------


def q_embedding_dim_skew(sf_dir: str):
    """Top-10 embedding dimensions by |skewness| (population, micro-unit
    integers): dim, n, skewness. Ties break dim-ascending on the
    bitwise-shared float."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def sums(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(batch["embedding"].to_numpy()).astype(np.float64)
        y = mat * 1e6
        q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        n, d = q.shape
        rows = []
        for dim in range(d):
            col = [int(x) for x in q[:, dim]]
            rows.append(
                (
                    dim,
                    n,
                    sum(col),
                    sum(x * x for x in col),
                    str(sum(x * x * x for x in col)),
                )
            )
        return pd.DataFrame(
            rows, columns=["dim", "n", "s1", "s2", "s3"]
        ).astype({"dim": np.int64, "n": np.int64, "s1": np.int64,
                  "s2": np.int64})

    parts = (
        ds.map_batches(sums, batch_format="pandas")
        .to_pandas()
    )
    out_empty = pd.DataFrame(
        {"dim": pd.Series(dtype=np.int64),
         "n_vecs": pd.Series(dtype=np.int64),
         "skewness": pd.Series(dtype=np.float64)}
    )
    if parts.empty:
        return out_empty
    rows = []
    for dim, g in parts.groupby("dim", sort=True):
        n = int(g["n"].sum())
        if n < 2:
            continue
        s1 = int(g["s1"].sum())
        s2 = int(g["s2"].sum())
        s3 = sum(int(x) for x in g["s3"])
        m = float(s1) / n
        m2 = float(s2) / n - m * m
        if m2 <= 0.0:
            continue
        m3 = float(s3) / n - 3.0 * m * (float(s2) / n) + 2.0 * m * m * m
        skew = m3 / (m2 * math.sqrt(m2))
        rows.append((int(dim), n, skew))
    rows.sort(key=lambda r: (-abs(r[2]), r[0]))
    top = rows[:10]
    if not top:
        return out_empty
    return pd.DataFrame(
        {
            "dim": np.array([r[0] for r in top], dtype=np.int64),
            "n_vecs": np.array([r[1] for r in top], dtype=np.int64),
            "skewness": [float(_r6away(r[2])) for r in top],
        }
    )


ORACLES86["embedding_dim_skew"] = """
WITH e AS (
  SELECT unnest(range(0, len(embedding))) AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT)
           AS q
  FROM embeddings
),
s AS (
  SELECT dim, COUNT(*) AS n,
         CAST(SUM(q) AS BIGINT) AS s1,
         CAST(SUM(CAST(q AS HUGEINT) * q) AS HUGEINT) AS s2,
         CAST(SUM(CAST(q AS HUGEINT) * q * q) AS HUGEINT) AS s3
  FROM e GROUP BY 1 HAVING COUNT(*) >= 2
),
f AS (
  SELECT dim, n,
         CAST(s1 AS DOUBLE) / n AS m,
         CAST(s2 AS DOUBLE) / n
           - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n) AS m2,
         CAST(s2 AS DOUBLE) / n AS r2,
         CAST(s3 AS DOUBLE) / n AS r3
  FROM s
),
sk AS (
  SELECT dim, n,
         (r3 - 3.0 * m * r2 + 2.0 * m * m * m) / (m2 * sqrt(m2)) AS skew
  FROM f WHERE m2 > 0
)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n_vecs,
       ROUND(skew, 6) AS skewness
FROM sk
QUALIFY row_number() OVER (ORDER BY abs(skew) DESC, dim ASC) <= 10
"""


# ---------------------------------------------------------------------------
# Weekend-preference histogram over users
# ---------------------------------------------------------------------------


def q_weekend_preference_histogram(sf_dir: str):
    """How many users put band/10 of their events on weekends: band =
    (10 * weekend_events) // total_events (0..10). Exact integers."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: (
            lambda us: pd.DataFrame(
                {
                    "user_id": b["user_id"].astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                    "wk": (((us // DAY_US) + 3) % 7 >= 5).astype(np.int64),
                }
            )
        )(b["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        .groupby("user_id", sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_user = hash_bucket_aggregate(
        ev, ["user_id"], [("n", "sum"), ("wk", "sum")]
    )
    hist = (
        hash_bucket_aggregate(
            per_user.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "band": (
                            10 * b["wk_sum"].astype(np.int64)
                            // b["n_sum"].astype(np.int64)
                        ).astype(np.int64),
                        "c": np.ones(len(b), dtype=np.int64),
                    }
                )
                .groupby("band", sort=False)
                .sum()
                .reset_index(),
                batch_format="pandas",
            ),
            ["band"],
            [("c", "sum")],
        )
        .to_pandas()
        .sort_values("band")
    )
    return pd.DataFrame(
        {
            "band": hist["band"].astype(np.int64),
            "n_users": hist["c_sum"].astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES86["weekend_preference_histogram"] = """
WITH u AS (
  SELECT user_id, COUNT(*) AS n,
         COUNT(*) FILTER (
           WHERE (epoch_us(ts) // 86400000000 + 3) % 7 >= 5
         ) AS wk
  FROM events GROUP BY 1
)
SELECT CAST(10 * wk // n AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Mean value by line number
# ---------------------------------------------------------------------------


def q_value_by_linenumber(sf_dir: str):
    """Per l_linenumber: item count and mean extended price — the
    order-position value profile. Exact cents."""
    li = _read(sf_dir, "lineitem", ["l_linenumber", "l_extendedprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "ln": batch["l_linenumber"].astype(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                    "cents": _cents(batch["l_extendedprice"]),
                }
            )
            .groupby("ln", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            li.map_batches(partial, batch_format="pandas"),
            ["ln"],
            [("n", "sum"), ("cents", "sum")],
        )
        .to_pandas()
        .sort_values("ln")
    )
    return pd.DataFrame(
        {
            "linenumber": agg["ln"].astype(np.int64),
            "n_items": agg["n_sum"].astype(np.int64),
            "mean_price": _r6away(
                agg["cents_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
                / 100.0
            ),
        }
    ).reset_index(drop=True)


ORACLES86["value_by_linenumber"] = """
SELECT CAST(l_linenumber AS BIGINT) AS linenumber,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS mean_price
FROM lineitem GROUP BY 1
"""


QUERIES86["embedding_dim_skew"] = q_embedding_dim_skew
QUERIES86["weekend_preference_histogram"] = q_weekend_preference_histogram
QUERIES86["value_by_linenumber"] = q_value_by_linenumber
