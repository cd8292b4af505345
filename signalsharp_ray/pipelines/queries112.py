"""Round-3 batch 114: null-signal and network-reach operators — the
zero-value event share per type (dead-metric audit), mean sentences
per document by language, and the top-10 suppliers by distinct
customers reached (the supply network's widest hubs, through the
lineitem -> orders co-partitioned join).

House parity: zero predicates and sentence counts are exact integers;
reach dedups (supplier, customer) pairs in exchanges with (reach DESC,
suppkey ASC) selection.

Scale contracts: all pre-reduce through bucketed exchanges; only
bounded heads reach the driver.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries4 import _cents
from .queries16 import _read, _TOKEN_RE

QUERIES112: dict = {}
ORACLES112: dict = {}

_SENT_RE = re.compile(r"[.!?]+")


# ---------------------------------------------------------------------------
# Zero-value share per type
# ---------------------------------------------------------------------------


def q_zero_value_share(sf_dir: str):
    """Per event_type: events and the share with exactly zero
    centivalue — dead or placeholder metrics."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = _cents(batch["value"])
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "n": np.ones(len(c), dtype=np.int64),
                    "z": (c == 0).astype(np.int64),
                }
            )
            .groupby("event_type", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type"],
            [("n", "sum"), ("z", "sum")],
        )
        .to_pandas()
        .sort_values("event_type")
    )
    return pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_events": agg["n_sum"].astype(np.int64),
            "n_zero": agg["z_sum"].astype(np.int64),
            "zero_share": _r6away(
                agg["z_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES112["zero_value_share"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (
         WHERE CAST(ROUND(value * 100) AS BIGINT) = 0
       ) AS BIGINT) AS n_zero,
       ROUND(CAST(COUNT(*) FILTER (
               WHERE CAST(ROUND(value * 100) AS BIGINT) = 0
             ) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS zero_share
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Sentences per doc by language
# ---------------------------------------------------------------------------


def q_sentences_per_doc_by_lang(sf_dir: str):
    """Per language: docs with >= 1 sentence and the mean sentences per
    such doc (batch-70 splitter)."""
    docs = _documents(sf_dir, ["lang", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for lang, text in zip(batch["lang"], batch["text"]):
            ns = 0
            for seg in _SENT_RE.split((text or "").lower()):
                if _TOKEN_RE.search(seg):
                    ns += 1
            if ns:
                rows.append((lang, 1, ns))
        return pd.DataFrame(
            rows, columns=["lang", "d", "s"]
        ).astype({"d": np.int64, "s": np.int64})

    agg = (
        hash_bucket_aggregate(
            docs.map_batches(partial, batch_format="pandas"),
            ["lang"],
            [("d", "sum"), ("s", "sum")],
        )
        .to_pandas()
        .sort_values("lang")
    )
    return pd.DataFrame(
        {
            "lang": agg["lang"].astype(str),
            "n_docs": agg["d_sum"].astype(np.int64),
            "mean_sentences": _r6away(
                agg["s_sum"].to_numpy(np.float64)
                / agg["d_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES112["sentences_per_doc_by_lang"] = """
WITH segs AS (
  SELECT doc_id, lang,
         UNNEST(regexp_split_to_array(lower(COALESCE(text, '')), '[.!?]+'))
           AS seg
  FROM documents
),
pd2 AS (
  SELECT doc_id, lang,
         COUNT(*) FILTER (
           WHERE len(regexp_extract_all(seg, '[\\p{L}\\p{N}_]+')) > 0
         ) AS ns
  FROM segs GROUP BY 1, 2
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(CAST(SUM(ns) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_sentences
FROM pd2 WHERE ns > 0 GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Supplier customer reach
# ---------------------------------------------------------------------------


def q_supplier_customer_reach(sf_dir: str, k: int = 10):
    """Top-10 suppliers by distinct customers reached (reach DESC,
    suppkey ASC), with their shipment counts."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["l_orderkey"].astype(np.int64),
                "suppkey": b["l_suppkey"].astype(np.int64),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby(["l_orderkey", "suppkey"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_pair = hash_bucket_aggregate(
        li, ["l_orderkey", "suppkey"], [("n", "sum")]
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].astype(np.int64),
                "custkey": b["o_custkey"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_pair, orders, on=["l_orderkey"])

    def pairs(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "custkey" not in batch.columns:
            return pd.DataFrame(
                {"suppkey": pd.Series(dtype=np.int64),
                 "custkey": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64)}
            )
        b = batch.dropna(subset=["custkey"])
        return (
            pd.DataFrame(
                {
                    "suppkey": b["suppkey"].astype(np.int64),
                    "custkey": b["custkey"].astype(np.int64),
                    "n": b["n_sum"].astype(np.int64),
                }
            )
            .groupby(["suppkey", "custkey"], sort=False)
            .sum()
            .reset_index()
        )

    sc = hash_bucket_aggregate(
        joined.map_batches(pairs, batch_format="pandas"),
        ["suppkey", "custkey"],
        [("n", "sum")],
    )
    agg = (
        hash_bucket_aggregate(
            sc.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "suppkey": b["suppkey"].astype(np.int64),
                        "reach": np.ones(len(b), dtype=np.int64),
                        "ship": b["n_sum"].astype(np.int64),
                    }
                )
                .groupby("suppkey", sort=False)
                .sum()
                .reset_index(),
                batch_format="pandas",
            ),
            ["suppkey"],
            [("reach", "sum"), ("ship", "sum")],
        )
        .to_pandas()
        .sort_values(["reach_sum", "suppkey"], ascending=[False, True])
        .head(k)
    )
    return pd.DataFrame(
        {
            "suppkey": agg["suppkey"].astype(np.int64),
            "n_customers": agg["reach_sum"].astype(np.int64),
            "n_shipments": agg["ship_sum"].astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES112["supplier_customer_reach"] = """
WITH sc AS (
  SELECT l.l_suppkey AS suppkey, o.o_custkey AS custkey,
         COUNT(*) AS n
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
  GROUP BY 1, 2
),
a AS (
  SELECT suppkey, COUNT(*) AS reach, CAST(SUM(n) AS BIGINT) AS ship
  FROM sc GROUP BY 1
)
SELECT CAST(suppkey AS BIGINT) AS suppkey,
       CAST(reach AS BIGINT) AS n_customers,
       ship AS n_shipments
FROM a
QUALIFY row_number() OVER (ORDER BY reach DESC, suppkey ASC) <= 10
"""


QUERIES112["zero_value_share"] = q_zero_value_share
QUERIES112["sentences_per_doc_by_lang"] = q_sentences_per_doc_by_lang
QUERIES112["supplier_customer_reach"] = q_supplier_customer_reach
