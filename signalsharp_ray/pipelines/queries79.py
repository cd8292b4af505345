"""Round-3 batch 81: relational shapes and doc-structure dependence —
supplier counts per part class (the TPC-H-Q16 shape over the
lineitem-derived supplier-part graph: how many distinct suppliers
serve each (brand, size-band) class), the correlation between a
document's sentence count and its character length, and the mean
discount by order priority (the lineitem x orders co-partitioned
join).

House parity: distinct (supplier, part) pairs dedup through one
exchange and the class counts are exact integers; the sentence
splitter is batch-70's [.!?]+ / token rule; discount basis points and
all Pearson terms are exact integers with HUGEINT-safe products.

Scale contracts: the Q16 shape dedups pairs in the exchange and
broadcasts only the bounded part-dimension attributes; the priority
join buckets on orderkey (no fact broadcast); the correlation is a
pure partial+final reduce.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries16 import _read, _TOKEN_RE

QUERIES79: dict = {}
ORACLES79: dict = {}

_SENT_RE = re.compile(r"[.!?]+")


# ---------------------------------------------------------------------------
# Supplier counts per part class (Q16 shape)
# ---------------------------------------------------------------------------


def q_supplier_count_by_part_class(sf_dir: str):
    """Distinct supplier count per (p_brand, size band p_size // 10)
    class, derived from observed lineitem (partkey, suppkey) pairs —
    the TPC-H Q16 shape over the shipment-derived supply graph.
    Ordered by (supplier_cnt DESC, brand ASC, size_band ASC)."""
    # part class attaches to the distinct (partkey, suppkey) pairs through
    # one co-partitioned bucketed_join — never a driver dict (part is
    # O(sf): 2e7 rows at sf100)
    from ..common.raytools import bucketed_join

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "suppkey": b["l_suppkey"].astype(np.int64),
                "one": np.ones(len(b), dtype=np.int64),
            }
        ).drop_duplicates(subset=["partkey", "suppkey"]),
        batch_format="pandas",
    )
    pairs = hash_bucket_aggregate(
        li, ["partkey", "suppkey"], [("one", "max")]
    )
    dim = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["p_partkey"].astype(np.int64),
                "brand": b["p_brand"].astype(str),
                "size_band": (b["p_size"].astype(np.int64) // 10).astype(
                    np.int64
                ),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(pairs, dim, on=["partkey"])

    def classify(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "brand": batch["brand"].astype(str),
                "size_band": batch["size_band"].astype(np.int64),
                "suppkey": batch["suppkey"].astype(np.int64),
                "one": np.ones(len(batch), dtype=np.int64),
            }
        ).drop_duplicates(subset=["brand", "size_band", "suppkey"])

    cls = hash_bucket_aggregate(
        joined.map_batches(classify, batch_format="pandas"),
        ["brand", "size_band", "suppkey"],
        [("one", "max")],
    ).to_pandas()
    out = (
        cls.groupby(["brand", "size_band"])
        .size()
        .reset_index(name="supplier_cnt")
        .astype({"size_band": np.int64, "supplier_cnt": np.int64})
        .sort_values(
            ["supplier_cnt", "brand", "size_band"],
            ascending=[False, True, True],
        )
        .reset_index(drop=True)
    )
    return out


ORACLES79["supplier_count_by_part_class"] = """
WITH sp AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
),
cls AS (
  SELECT DISTINCT p.p_brand AS brand, p.p_size // 10 AS size_band,
         sp.l_suppkey
  FROM sp JOIN part p ON p.p_partkey = sp.l_partkey
)
SELECT brand, CAST(size_band AS BIGINT) AS size_band,
       CAST(COUNT(*) AS BIGINT) AS supplier_cnt
FROM cls GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Sentence count vs character length correlation
# ---------------------------------------------------------------------------


def q_sentences_chars_corr(sf_dir: str):
    """One global row: Pearson correlation between per-document
    sentence count (batch-70 splitter) and character length — are long
    docs long because of more sentences. Exact integer sums."""
    docs = _documents(sf_dir, ["text", "n_chars"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s_cnt = []
        for text in batch["text"]:
            ns = 0
            for seg in _SENT_RE.split((text or "").lower()):
                if _TOKEN_RE.search(seg):
                    ns += 1
            s_cnt.append(ns)
        s = np.array(s_cnt, dtype=np.int64)
        c = batch["n_chars"].astype(np.int64).to_numpy()
        return pd.DataFrame(
            {
                "n": np.array([len(s)], dtype=np.int64),
                "ss": np.array([int(s.sum())], dtype=np.int64),
                "sc": np.array([int(c.sum())], dtype=np.int64),
                "sss": np.array([int((s * s).sum())], dtype=np.int64),
                "scc": np.array([int((c * c).sum())], dtype=np.int64),
                "ssc": np.array([int((s * c).sum())], dtype=np.int64),
            }
        )

    parts = docs.map_batches(partial, batch_format="pandas").to_pandas()
    out_empty = pd.DataFrame(
        {"n_docs": pd.Series(dtype=np.int64),
         "r": pd.Series(dtype=np.float64)}
    )
    n = int(parts["n"].sum())
    if n < 2:
        return out_empty
    ss, sc = int(parts["ss"].sum()), int(parts["sc"].sum())
    sss, scc, ssc = (
        int(parts["sss"].sum()),
        int(parts["scc"].sum()),
        int(parts["ssc"].sum()),
    )
    ds_ = float(n * sss - ss * ss)
    dc = float(n * scc - sc * sc)
    if ds_ <= 0.0 or dc <= 0.0:
        return out_empty
    r = float(n * ssc - ss * sc) / (math.sqrt(ds_) * math.sqrt(dc))
    return pd.DataFrame(
        {"n_docs": np.array([n], dtype=np.int64), "r": [float(_r6away(r))]}
    )


ORACLES79["sentences_chars_corr"] = """
WITH segs AS (
  SELECT doc_id, n_chars,
         UNNEST(regexp_split_to_array(lower(COALESCE(text, '')), '[.!?]+'))
           AS seg
  FROM documents
),
pc AS (
  SELECT doc_id, MAX(n_chars) AS c,
         COUNT(*) FILTER (
           WHERE len(regexp_extract_all(seg, '[\\p{L}\\p{N}_]+')) > 0
         ) AS s
  FROM segs GROUP BY 1
),
agg AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(s*s) AS BIGINT) AS sss,
         CAST(SUM(CAST(c AS HUGEINT)*c) AS HUGEINT) AS scc,
         CAST(SUM(CAST(s AS HUGEINT)*c) AS HUGEINT) AS ssc
  FROM pc
)
SELECT CAST(n AS BIGINT) AS n_docs,
       ROUND(CAST(CAST(n AS HUGEINT) * ssc
                  - CAST(ss AS HUGEINT) * sc AS DOUBLE)
             / (sqrt(CAST(CAST(n AS HUGEINT) * sss
                          - CAST(ss AS HUGEINT) * ss AS DOUBLE))
                * sqrt(CAST(CAST(n AS HUGEINT) * scc
                            - CAST(sc AS HUGEINT) * sc AS DOUBLE))), 6) AS r
FROM agg
WHERE n >= 2
  AND CAST(n AS HUGEINT) * sss - CAST(ss AS HUGEINT) * ss > 0
  AND CAST(n AS HUGEINT) * scc - CAST(sc AS HUGEINT) * sc > 0
"""


# ---------------------------------------------------------------------------
# Mean discount by order priority
# ---------------------------------------------------------------------------


def q_discount_by_priority(sf_dir: str):
    """Per o_orderpriority: lineitem count and mean discount percent —
    do urgent orders get better prices. The lineitem partials
    pre-reduce per orderkey, join orders through the co-partitioned
    bucketed exchange, and re-aggregate per priority."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_discount"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype(np.int64),
                "bp": np.rint(
                    b["l_discount"].to_numpy(np.float64) * 10000
                ).astype(np.int64),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby("l_orderkey", sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_order = hash_bucket_aggregate(
        li, ["l_orderkey"], [("bp", "sum"), ("n", "sum")]
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_orderpriority"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].astype(np.int64),
                "priority": b["o_orderpriority"],
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_order, orders, on=["l_orderkey"])

    def per_prio(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "priority" not in batch.columns:
            return pd.DataFrame(
                {"priority": pd.Series(dtype=object),
                 "bp": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64)}
            )
        b = batch.dropna(subset=["priority", "bp_sum"])
        return (
            pd.DataFrame(
                {
                    "priority": b["priority"],
                    "bp": b["bp_sum"].astype(np.int64),
                    "n": b["n_sum"].astype(np.int64),
                }
            )
            .groupby("priority", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            joined.map_batches(per_prio, batch_format="pandas"),
            ["priority"],
            [("bp", "sum"), ("n", "sum")],
        )
        .to_pandas()
        .sort_values("priority")
    )
    return pd.DataFrame(
        {
            "priority": agg["priority"].astype(str),
            "n_items": agg["n_sum"].astype(np.int64),
            "mean_discount_pct": _r6away(
                agg["bp_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
                / 100.0
            ),
        }
    ).reset_index(drop=True)


ORACLES79["discount_by_priority"] = """
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(ROUND(l.l_discount * 10000) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS mean_discount_pct
FROM lineitem l
JOIN orders o ON o.o_orderkey = l.l_orderkey
GROUP BY 1
"""


QUERIES79["supplier_count_by_part_class"] = q_supplier_count_by_part_class
QUERIES79["sentences_chars_corr"] = q_sentences_chars_corr
QUERIES79["discount_by_priority"] = q_discount_by_priority
