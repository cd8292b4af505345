"""Round-3 batch 32: language-model and fulfilment diagnostics — the
per-source cross-perplexity under the corpus character-trigram model
(how 'surprising' each source is to a model trained on the whole
corpus — the model-based twin of source_cross_entropy), basket
diversity per order (distinct part types per order, histogrammed),
and order-priority lead time (days from order date to first shipment,
exact integer day sums).

House parity: trigram/bigram-context counts are exact integers through
alphabet-bounded exchanges; the conditional log-likelihood folds over
ascending trigram per source (list_sum contract) with libm logs, and
perplexity = exp(-LL/N) (libm exp == DuckDB); basket diversity is an
exact distinct-count through a key-deduplicating exchange; lead times
are integer day differences summed exactly.

Scale contracts: trigram tables are alphabet^3-bounded; the basket
distinct-count dedups (order, type) keys inside the exchange; lead
times reduce per order then per priority.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES30: dict = {}
ORACLES30: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Char-trigram cross-perplexity per source
# ---------------------------------------------------------------------------


def q_trigram_perplexity(sf_dir: str):
    """Per source: perplexity under the CORPUS character-trigram model
    P(c3 | c1c2) = count(tri)/count(bi-context) — sources whose text the
    corpus model finds surprising score high (the model-based
    out-of-distribution gauge). Counts are exact integers; the
    log-likelihood folds over ascending trigram per source and
    perplexity is one exp of a transcribed ratio."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for src, text in zip(batch["source"], batch["text"]):
            t = text or ""
            for i in range(len(t) - 2):
                key = (src, t[i : i + 3])
                rows[key] = rows.get(key, 0) + 1
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "tri": [k[1] for k in keys],
                "m": np.array([rows[k] for k in keys], dtype=np.int64),
            }
        )

    per_src_tri = (
        hash_bucket_aggregate(
            docs.map_batches(partial, batch_format="pandas"),
            ["source", "tri"],
            [("m", "sum")],
        ).to_pandas()
    )
    corpus_tri = (
        per_src_tri.groupby("tri", sort=True)["m_sum"].sum().astype(np.int64)
    )
    # bigram-context totals: group corpus trigram counts by first 2 chars
    ctx = corpus_tri.groupby(corpus_tri.index.str[:2]).sum().astype(np.int64)
    rows = []
    for src, g in per_src_tri.groupby("source", sort=True):
        g = g.sort_values("tri")
        n = int(g["m_sum"].sum())
        tri_g = corpus_tri.loc[g["tri"]].to_numpy(np.int64)
        ctx_g = ctx.loc[g["tri"].str[:2]].to_numpy(np.int64)
        ll = _fold(
            [
                float(int(m))
                * (math.log(float(int(tg))) - math.log(float(int(cg))))
                for m, tg, cg in zip(g["m_sum"], tri_g, ctx_g)
            ]
        )
        ppl = math.exp(-(ll / float(n)))
        rows.append((src, n, float(_r6away(ll)), float(_r6away(ppl))))
    return pd.DataFrame(
        rows, columns=["source", "n_trigrams", "log_likelihood", "perplexity"]
    ).astype({"n_trigrams": np.int64})


ORACLES30["trigram_perplexity"] = """
WITH tri AS (
  SELECT source,
         UNNEST(list_transform(range(0, length(text) - 2),
                               i -> substr(text, CAST(i AS INT) + 1, 3))) AS tri
  FROM documents
),
c AS (SELECT source, tri, COUNT(*) AS m FROM tri GROUP BY 1, 2),
g AS (SELECT tri, CAST(SUM(m) AS BIGINT) AS gm FROM c GROUP BY 1),
ctx AS (
  SELECT substr(tri, 1, 2) AS bi, CAST(SUM(gm) AS BIGINT) AS cm
  FROM g GROUP BY 1
),
a AS (
  SELECT c.source,
         CAST(SUM(c.m) AS BIGINT) AS n,
         list_sum(list(
           CAST(c.m AS DOUBLE)
           * (ln(CAST(g.gm AS DOUBLE)) - ln(CAST(ctx.cm AS DOUBLE)))
           ORDER BY c.tri)) AS ll
  FROM c
  JOIN g USING (tri)
  JOIN ctx ON ctx.bi = substr(c.tri, 1, 2)
  GROUP BY 1
)
SELECT source,
       n AS n_trigrams,
       ROUND(ll, 6) AS log_likelihood,
       ROUND(exp(-(ll / CAST(n AS DOUBLE))), 6) AS perplexity
FROM a
"""


# ---------------------------------------------------------------------------
# Basket diversity per order
# ---------------------------------------------------------------------------


def q_basket_diversity(sf_dir: str):
    """Histogram of distinct part TYPES per order — single-type baskets
    vs diverse carts (linecount_histogram counts lines; this counts
    variety). The (order, type) pairs dedup inside one exchange; the
    per-order distinct count and the histogram are exact integers."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "partkey": b["l_partkey"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["p_partkey"].astype(np.int64),
                "ptype": b["p_type"],
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(li, part, on=["partkey"], how="inner")
    pairs = hash_bucket_aggregate(
        joined.map_batches(
            lambda b: b[["orderkey", "ptype"]]
            .drop_duplicates()
            .assign(one=lambda d: np.ones(len(d), dtype=np.int64)),
            batch_format="pandas",
        ),
        ["orderkey", "ptype"],
        [("one", "max")],
    )
    per_order = hash_bucket_aggregate(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {
                    "orderkey": b["orderkey"].astype(np.int64),
                    "k": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["orderkey"],
        [("k", "sum")],
    )
    hist = hash_bucket_aggregate(
        per_order.map_batches(
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
                "n_orders": hist["c_sum"].astype(np.int64),
            }
        )
        .sort_values("n_types")
        .reset_index(drop=True)
    )


ORACLES30["basket_diversity"] = """
WITH d AS (
  SELECT l.l_orderkey AS ok, COUNT(DISTINCT p.p_type) AS k
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS n_types,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Order-priority lead time
# ---------------------------------------------------------------------------


def q_priority_lead_time(sf_dir: str):
    """Per order priority: mean days from order date to the FIRST
    shipment — does urgency actually ship faster. First-ship dates
    reduce through one min-exchange; day differences are exact
    integers; one transcribed division."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "ship_us": b["l_shipdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby("orderkey", sort=False)["ship_us"]
        .min()
        .reset_index(),
        batch_format="pandas",
    )
    first_ship = hash_bucket_aggregate(li, ["orderkey"], [("ship_us", "min")])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "date_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
                "priority": b["o_orderpriority"],
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(orders, first_ship, on=["orderkey"], how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        days = (
            b["ship_us_min"].astype(np.int64) - b["date_us"].astype(np.int64)
        ) // DAY_US
        g = (
            pd.DataFrame({"priority": b["priority"], "d": days})
            .assign(n=lambda x: np.ones(len(x), dtype=np.int64))
            .groupby("priority", sort=False)
            .agg(n=("n", "sum"), d=("d", "sum"))
            .reset_index()
        )
        return g

    agg = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["priority"],
        [("n", "sum"), ("d", "sum")],
    ).to_pandas()
    mean = [
        float(_r6away(float(int(d)) / float(int(n))))
        for d, n in zip(agg["d_sum"], agg["n_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "priority": agg["priority"],
                "n_orders": agg["n_sum"].astype(np.int64),
                "total_days": agg["d_sum"].astype(np.int64),
                "mean_lead_days": mean,
            }
        )
        .sort_values("priority")
        .reset_index(drop=True)
    )


ORACLES30["priority_lead_time"] = """
WITH f AS (
  SELECT l_orderkey, MIN(l_shipdate) AS fs FROM lineitem GROUP BY 1
),
j AS (
  SELECT o.o_orderpriority AS priority,
         (epoch_us(f.fs) - epoch_us(o.o_orderdate)) // 86400000000 AS d
  FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
)
SELECT priority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(d) AS BIGINT) AS total_days,
       ROUND(CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS mean_lead_days
FROM j GROUP BY 1
"""


QUERIES30["trigram_perplexity"] = q_trigram_perplexity
QUERIES30["basket_diversity"] = q_basket_diversity
QUERIES30["priority_lead_time"] = q_priority_lead_time
