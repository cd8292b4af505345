"""Round-3 batch 46: novelty and breadth diagnostics — character-
trigram uniqueness per source (what share of a source's distinct
trigrams appear nowhere else — the marginal-novelty gauge for corpus
mixing), first-order vs repeat-order value (do newcomers spend
differently, exact cents with deterministic first-order selection),
and the user type-breadth histogram (how many distinct event types
each user touches).

House parity: trigram presence reduces to per-trigram source counts
(exact integers); the first order per customer is the (orderdate,
orderkey) argmin; breadth distinct-counts dedup inside the exchange;
every share/mean is one transcribed division.

Scale contracts: trigram tables are alphabet^3-bounded; first-order
selection runs inside custkey buckets; the breadth histogram is
catalog-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries16 import _cents_col, _read

QUERIES44: dict = {}
ORACLES44: dict = {}


# ---------------------------------------------------------------------------
# Trigram uniqueness per source
# ---------------------------------------------------------------------------


def q_trigram_uniqueness(sf_dir: str):
    """Per source: distinct character trigrams, how many of them occur
    in NO other source, and the uniqueness share — a source whose
    trigrams all exist elsewhere adds little textual novelty to the
    mix. Presence collapses to per-(trigram, source) rows in one
    exchange; uniqueness is an integer source-count comparison."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: set = set()
        for src, text in zip(batch["source"], batch["text"]):
            t = text or ""
            for i in range(len(t) - 2):
                rows.add((src, t[i : i + 3]))
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "tri": [k[1] for k in keys],
                "one": np.ones(len(keys), dtype=np.int64),
            }
        )

    pres = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "tri"],
        [("one", "max")],
    ).to_pandas()
    tri_sources = pres.groupby("tri")["source"].nunique()
    pres["n_sources"] = pres["tri"].map(tri_sources).astype(np.int64)
    rows = []
    for src, g in pres.groupby("source", sort=True):
        v = int(len(g))
        uniq = int((g["n_sources"] == 1).sum())
        rows.append((src, v, uniq, float(_r6away(float(uniq) / float(v)))))
    return pd.DataFrame(
        rows, columns=["source", "n_trigrams", "n_unique", "uniqueness"]
    ).astype({"n_trigrams": np.int64, "n_unique": np.int64})


ORACLES44["trigram_uniqueness"] = """
WITH tri AS (
  SELECT DISTINCT source,
         UNNEST(list_transform(range(0, length(text) - 2),
                               i -> substr(text, CAST(i AS INT) + 1, 3))) AS tri
  FROM documents
),
c AS (SELECT tri, COUNT(DISTINCT source) AS ns FROM tri GROUP BY 1),
a AS (
  SELECT t.source,
         COUNT(*) AS v,
         CAST(COUNT(*) FILTER (WHERE c.ns = 1) AS BIGINT) AS uniq
  FROM tri t JOIN c USING (tri)
  GROUP BY 1
)
SELECT source,
       CAST(v AS BIGINT) AS n_trigrams,
       uniq AS n_unique,
       ROUND(CAST(uniq AS DOUBLE) / CAST(v AS DOUBLE), 6) AS uniqueness
FROM a
"""


# ---------------------------------------------------------------------------
# First-order vs repeat-order value
# ---------------------------------------------------------------------------


def q_first_vs_repeat_value(sf_dir: str):
    """Global mean value of FIRST orders (per customer, (orderdate,
    orderkey) argmin) vs all later orders, with the repeat premium
    ratio — do customers start small. Exact cents sums; deterministic
    first-order selection inside custkey buckets."""
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "orderkey": b["o_orderkey"].astype(np.int64),
                "date_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
                "c": _cents_col(b["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )

    def bucket_kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["custkey", "date_us", "orderkey"])
        ck = df["custkey"].to_numpy(np.int64)
        first_mask = np.concatenate(([True], ck[1:] != ck[:-1]))
        c = df["c"].to_numpy(np.int64)
        return pd.DataFrame(
            {
                "kind": np.where(first_mask, 0, 1).astype(np.int64),
                "n": np.ones(len(df), dtype=np.int64),
                "s": c,
            }
        ).groupby("kind", sort=False).agg(n=("n", "sum"), s=("s", "sum")).reset_index()

    agg = hash_bucket_aggregate(
        bucketed_map_groups(orders, ["custkey"], None, whole_bucket_fn=bucket_kernel),
        ["kind"],
        [("n", "sum"), ("s", "sum")],
    ).to_pandas().set_index("kind")
    nf, sf_ = int(agg.loc[0, "n_sum"]), int(agg.loc[0, "s_sum"])
    nr, sr = int(agg.loc[1, "n_sum"]), int(agg.loc[1, "s_sum"])
    mean_first = float(sf_) / float(nf) / 100.0
    mean_repeat = float(sr) / float(nr) / 100.0
    return pd.DataFrame(
        {
            "n_first": np.array([nf], dtype=np.int64),
            "n_repeat": np.array([nr], dtype=np.int64),
            "mean_first": [float(_r6away(mean_first))],
            "mean_repeat": [float(_r6away(mean_repeat))],
            "repeat_premium": [float(_r6away(mean_repeat / mean_first))],
        }
    )


ORACLES44["first_vs_repeat_value"] = """
WITH r AS (
  SELECT o_custkey,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate, o_orderkey) AS rn
  FROM orders
),
a AS (
  SELECT CASE WHEN rn = 1 THEN 0 ELSE 1 END AS kind,
         COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS s
  FROM r GROUP BY 1
),
p AS (
  SELECT MAX(CASE WHEN kind = 0 THEN n END) AS nf,
         MAX(CASE WHEN kind = 0 THEN s END) AS sf,
         MAX(CASE WHEN kind = 1 THEN n END) AS nr,
         MAX(CASE WHEN kind = 1 THEN s END) AS sr
  FROM a
)
SELECT CAST(nf AS BIGINT) AS n_first,
       CAST(nr AS BIGINT) AS n_repeat,
       ROUND(CAST(sf AS DOUBLE) / CAST(nf AS DOUBLE) / 100.0, 6) AS mean_first,
       ROUND(CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) / 100.0, 6) AS mean_repeat,
       ROUND((CAST(sr AS DOUBLE) / CAST(nr AS DOUBLE) / 100.0)
             / (CAST(sf AS DOUBLE) / CAST(nf AS DOUBLE) / 100.0), 6)
         AS repeat_premium
FROM p
"""


# ---------------------------------------------------------------------------
# User type-breadth histogram
# ---------------------------------------------------------------------------


def q_user_breadth_histogram(sf_dir: str):
    """How many users touch exactly k distinct event types — the
    engagement-breadth distribution (user_type_entropy averages; this
    shows the whole shape). Distinct (user, type) pairs dedup inside
    one exchange; the histogram is catalog-bounded."""
    ev = _events(sf_dir, ["user_id", "event_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "event_type": b["event_type"],
            }
        )
        .drop_duplicates()
        .assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
        batch_format="pandas",
    )
    pairs = hash_bucket_aggregate(ev, ["user_id", "event_type"], [("one", "max")])
    per_user = hash_bucket_aggregate(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {
                    "user_id": b["user_id"].astype(np.int64),
                    "k": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["user_id"],
        [("k", "sum")],
    )
    hist = hash_bucket_aggregate(
        per_user.map_batches(
            lambda b: pd.DataFrame(
                {
                    "n_types": b["k_sum"].astype(np.int64),
                    "c": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["n_types"],
        [("c", "sum")],
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "n_types": hist["n_types"].astype(np.int64),
                "n_users": hist["c_sum"].astype(np.int64),
            }
        )
        .sort_values("n_types")
        .reset_index(drop=True)
    )


ORACLES44["user_breadth_histogram"] = """
WITH u AS (
  SELECT user_id, COUNT(DISTINCT event_type) AS k
  FROM events GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS n_types,
       CAST(COUNT(*) AS BIGINT) AS n_users
FROM u GROUP BY 1
"""


QUERIES44["trigram_uniqueness"] = q_trigram_uniqueness
QUERIES44["first_vs_repeat_value"] = q_first_vs_repeat_value
QUERIES44["user_breadth_histogram"] = q_user_breadth_histogram
