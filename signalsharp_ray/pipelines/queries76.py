"""Round-3 batch 78: sketch introspection and effect-size operators —
the LSH bucket-size histogram (how balanced are the banded MinHash
buckets the near-dup pipeline shuffles on), the per-supplier unit-price
premium against the corpus mean, and Cohen's d effect size of the
weekend on event values (the standardized companion to
weekend_effect's Welch t).

House parity: LSH buckets reuse the END-TO-END-verified md5-permutation
banding (queries5.LSH_CANDIDATES_SQL prefix verbatim) and reduce to
integer bucket sizes; unit prices are half-away cents
(queries42._unit_cents == SQL ROUND); Cohen's d combines exact cents /
HUGEINT-squared sums in one transcribed expression.

Scale contracts: bucket sizes aggregate per (band, s_lo, s_hi) key
through one exchange, the histogram is size-bounded; the premium and
effect size are pure partial+final combines.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries5 import LSH_CANDIDATES_SQL, lsh_band_batch
from .queries2 import _documents
from .queries16 import _read
from .queries42 import _unit_cents

QUERIES76: dict = {}
ORACLES76: dict = {}

DAY_US = 86_400_000_000

# everything through the `bands` CTE of the verified candidate SQL
_LSH_BANDS_PREFIX = LSH_CANDIDATES_SQL.rsplit("SELECT a.doc_id", 1)[0]


# ---------------------------------------------------------------------------
# LSH bucket-size histogram
# ---------------------------------------------------------------------------


def q_lsh_bucket_histogram(sf_dir: str):
    """Histogram of banded-LSH bucket sizes: how many (band, signature)
    buckets hold exactly k documents. The skew diagnostic for the
    near-dup exchange — a heavy bucket is a shuffle hotspot. Integer
    only."""
    bands = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        lsh_band_batch, batch_format="pandas"
    ).map_batches(
        lambda b: b.assign(one=np.ones(len(b), dtype=np.int64)),
        batch_format="pandas",
    )
    sizes = hash_bucket_aggregate(
        bands, ["band", "s_lo", "s_hi"], [("one", "sum")]
    )

    def hist(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch["one_sum"]
            .astype(np.int64)
            .value_counts()
            .rename_axis("bucket_size")
            .reset_index(name="n_buckets")
        )
        g["n_buckets"] = g["n_buckets"].astype(np.int64)
        return g

    agg = (
        hash_bucket_aggregate(
            sizes.map_batches(hist, batch_format="pandas"),
            ["bucket_size"],
            [("n_buckets", "sum")],
        )
        .to_pandas()
        .sort_values("bucket_size")
    )
    return pd.DataFrame(
        {
            "bucket_size": agg["bucket_size"].astype(np.int64),
            "n_buckets": agg["n_buckets_sum"].astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES76["lsh_bucket_histogram"] = _LSH_BANDS_PREFIX + """
SELECT CAST(size AS BIGINT) AS bucket_size,
       CAST(COUNT(*) AS BIGINT) AS n_buckets
FROM (
  SELECT band, s_lo, s_hi, COUNT(*) AS size
  FROM bands GROUP BY 1, 2, 3
)
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Supplier unit-price premium
# ---------------------------------------------------------------------------


def q_supplier_price_premium(sf_dir: str):
    """Per supplier: lineitem count, mean unit price (half-away cents
    of extendedprice/quantity), and the premium ratio against the
    corpus mean unit price. Exact integer sums; two transcribed
    divisions per row plus the shared global mean."""
    li = _read(
        sf_dir, "lineitem", ["l_suppkey", "l_extendedprice", "l_quantity"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        up = _unit_cents(
            batch["l_extendedprice"].to_numpy(np.float64),
            batch["l_quantity"].to_numpy(np.float64),
        )
        df = pd.DataFrame(
            {
                "suppkey": batch["l_suppkey"].astype(np.int64),
                "n": np.ones(len(batch), dtype=np.int64),
                "s": up,
            }
        )
        return df.groupby("suppkey", sort=False).sum().reset_index()

    agg = (
        hash_bucket_aggregate(
            li.map_batches(partial, batch_format="pandas"),
            ["suppkey"],
            [("n", "sum"), ("s", "sum")],
        )
        .to_pandas()
        .sort_values("suppkey")
    )
    N = int(agg["n_sum"].sum())
    S = int(agg["s_sum"].sum())
    if N == 0:
        return pd.DataFrame(
            {"suppkey": pd.Series(dtype=np.int64),
             "n_items": pd.Series(dtype=np.int64),
             "mean_unit_price": pd.Series(dtype=np.float64),
             "premium": pd.Series(dtype=np.float64)}
        )
    gmean = float(S) / float(N)
    rows = []
    for _, r in agg.iterrows():
        n = int(r["n_sum"])
        s = int(r["s_sum"])
        m = float(s) / float(n)
        rows.append(
            (int(r["suppkey"]), n, float(_r6away(m / 100.0)),
             float(_r6away(m / gmean)))
        )
    return pd.DataFrame(
        rows, columns=["suppkey", "n_items", "mean_unit_price", "premium"]
    ).astype({"suppkey": np.int64, "n_items": np.int64})


ORACLES76["supplier_price_premium"] = """
WITH u AS (
  SELECT l_suppkey AS suppkey,
         CAST(ROUND(l_extendedprice / l_quantity * 100.0) AS BIGINT) AS up
  FROM lineitem
),
a AS (
  SELECT suppkey, COUNT(*) AS n, CAST(SUM(up) AS BIGINT) AS s
  FROM u GROUP BY 1
),
tot AS (SELECT SUM(n) AS nn, CAST(SUM(s) AS BIGINT) AS ss FROM a)
SELECT a.suppkey, CAST(a.n AS BIGINT) AS n_items,
       ROUND(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) / 100.0, 6)
         AS mean_unit_price,
       ROUND((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE))
             / (CAST(tot.ss AS DOUBLE) / CAST(tot.nn AS DOUBLE)), 6)
         AS premium
FROM a, tot
"""


# ---------------------------------------------------------------------------
# Cohen's d of the weekend effect on event values
# ---------------------------------------------------------------------------


def q_cohens_d_weekend(sf_dir: str):
    """Cohen's d per event_type for weekend vs weekday event values
    (exact centivalues): d = (m1 - m0) / s_pooled with the pooled
    population sd sqrt((n0 v0 + n1 v1)/(n0 + n1)). Scale-free, so the
    cents unit cancels. Day-of-week is the weekend_effect convention
    ((d + 3) % 7 >= 5)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = (
            batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        )
        wk = (((ts // DAY_US) + 3) % 7 >= 5).astype(np.int64)
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        df = pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "wk": wk,
                "n": np.ones(len(batch), dtype=np.int64),
                "s": c,
                "ss": c * c,
            }
        )
        return df.groupby(["event_type", "wk"], sort=False).sum().reset_index()

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type", "wk"],
            [("n", "sum"), ("s", "sum"), ("ss", "sum")],
        )
        .to_pandas()
        .sort_values(["event_type", "wk"])
    )
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        g = g.set_index("wk")
        if 0 not in g.index or 1 not in g.index:
            continue
        n0, s0, ss0 = (int(g.loc[0, c]) for c in ["n_sum", "s_sum", "ss_sum"])
        n1, s1, ss1 = (int(g.loc[1, c]) for c in ["n_sum", "s_sum", "ss_sum"])
        m0 = float(s0) / float(n0)
        m1 = float(s1) / float(n1)
        v0 = float(ss0) / float(n0) - m0 * m0
        v1 = float(ss1) / float(n1) - m1 * m1
        sp2 = (float(n0) * v0 + float(n1) * v1) / float(n0 + n1)
        if sp2 <= 0.0:
            continue
        d = (m1 - m0) / math.sqrt(sp2)
        rows.append((et, n0, n1, float(_r6away(d))))
    return pd.DataFrame(
        rows, columns=["event_type", "n_weekday", "n_weekend", "cohens_d"]
    ).astype({"n_weekday": np.int64, "n_weekend": np.int64})


ORACLES76["cohens_d_weekend"] = """
WITH b AS (
  SELECT event_type,
         CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 >= 5
              THEN 1 ELSE 0 END AS wk,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
g AS (
  SELECT event_type, wk, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM b GROUP BY 1, 2
),
w AS (
  SELECT g0.event_type,
         g0.n AS n0, g0.s AS s0, g0.ss AS ss0,
         g1.n AS n1, g1.s AS s1, g1.ss AS ss1
  FROM g g0 JOIN g g1
    ON g1.event_type = g0.event_type AND g0.wk = 0 AND g1.wk = 1
),
f AS (
  SELECT event_type, n0, n1,
         CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         CAST(ss0 AS DOUBLE) / CAST(n0 AS DOUBLE)
           - (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
             * (CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) AS v0,
         CAST(ss1 AS DOUBLE) / CAST(n1 AS DOUBLE)
           - (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
             * (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)) AS v1
  FROM w
)
SELECT event_type, CAST(n0 AS BIGINT) AS n_weekday,
       CAST(n1 AS BIGINT) AS n_weekend,
       ROUND((m1 - m0)
             / sqrt((CAST(n0 AS DOUBLE) * v0 + CAST(n1 AS DOUBLE) * v1)
                    / CAST(n0 + n1 AS DOUBLE)), 6) AS cohens_d
FROM f
WHERE (CAST(n0 AS DOUBLE) * v0 + CAST(n1 AS DOUBLE) * v1)
      / CAST(n0 + n1 AS DOUBLE) > 0
"""


QUERIES76["lsh_bucket_histogram"] = q_lsh_bucket_histogram
QUERIES76["supplier_price_premium"] = q_supplier_price_premium
QUERIES76["cohens_d_weekend"] = q_cohens_d_weekend
