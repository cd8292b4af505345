"""Round-3 batch 52: per-capita and growth-curve diagnostics — nation
revenue per customer (the monetized twin of nation_order_intensity),
and empirical vocabulary-growth checkpoints (distinct tokens seen
after 10% / 50% / 100% of documents in doc_id order — the measured
Heaps curve that heaps_law_by_source fits with one exponent).

House parity: revenue crosses exchanges as exact order-total cents
through a co-partitioned custkey join; checkpoint thresholds are exact
nearest-rank doc_id order statistics, and growth counting uses each
token's FIRST doc_id (a min-exchange) so the checkpoint count is a
pure integer comparison — no cumulative distinct scan.

Scale contracts: nation branches are bounded; the token first-seen
table is vocabulary-sized through one exchange; checkpoints are
constant-count.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries16 import _TOKEN_RE, _cents_col, _read

QUERIES50: dict = {}
ORACLES50: dict = {}

GROWTH_CHECKPOINTS = (10, 50, 100)  # percent of docs


# ---------------------------------------------------------------------------
# Nation revenue per customer
# ---------------------------------------------------------------------------


def q_nation_revenue_per_customer(sf_dir: str):
    """Per nation: customer count, exact order-revenue cents, and
    revenue per customer — where the money density is. Order totals
    reduce per customer through one exchange, join the customer table
    co-partitioned, roll up to the bounded nation table; one
    division."""
    import pyarrow.parquet as pq

    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(zip(nation["n_nationkey"].astype(np.int64), nation["n_name"]))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "c": _cents_col(b["o_totalprice"]),
            }
        )
        .groupby("custkey", sort=False)["c"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_cust = hash_bucket_aggregate(orders, ["custkey"], [("c", "sum")])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["c_custkey"].astype(np.int64),
                "nationkey": b["c_nationkey"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(cust, per_cust, on=["custkey"], how="left")
    agg = hash_bucket_aggregate(
        joined.map_batches(
            lambda b: pd.DataFrame(
                {
                    "nationkey": b["nationkey"].astype(np.int64),
                    "nc": np.ones(len(b), dtype=np.int64),
                    "rev": b["c_sum"].fillna(0).astype(np.int64),
                }
            )
            .groupby("nationkey", sort=False)
            .agg(nc=("nc", "sum"), rev=("rev", "sum"))
            .reset_index(),
            batch_format="pandas",
        ),
        ["nationkey"],
        [("nc", "sum"), ("rev", "sum")],
    ).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        nc, rev = int(r["nc_sum"]), int(r["rev_sum"])
        rows.append(
            (
                nmap[int(r["nationkey"])],
                nc,
                rev,
                float(_r6away(float(rev) / float(nc) / 100.0)),
            )
        )
    return (
        pd.DataFrame(
            rows,
            columns=["n_name", "n_customers", "revenue_c", "revenue_per_cust"],
        )
        .astype({"n_customers": np.int64, "revenue_c": np.int64})
        .sort_values("n_name")
        .reset_index(drop=True)
    )


ORACLES50["nation_revenue_per_customer"] = """
WITH o AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
a AS (
  SELECT c.c_nationkey AS nk,
         COUNT(*) AS nc,
         CAST(SUM(COALESCE(o.c, 0)) AS BIGINT) AS rev
  FROM customer c LEFT JOIN o ON o.ck = c.c_custkey
  GROUP BY 1
)
SELECT n.n_name,
       CAST(a.nc AS BIGINT) AS n_customers,
       a.rev AS revenue_c,
       ROUND(CAST(a.rev AS DOUBLE) / CAST(a.nc AS DOUBLE) / 100.0, 6)
         AS revenue_per_cust
FROM a JOIN nation n ON n.n_nationkey = a.nk
"""


# ---------------------------------------------------------------------------
# Vocabulary growth checkpoints
# ---------------------------------------------------------------------------


def q_vocab_growth(sf_dir: str):
    """Distinct tokens seen after the first 10% / 50% / 100% of
    documents (doc_id order, checkpoint = the exact ceil(p*n)-th
    doc_id) — the measured vocabulary growth curve. Each token reduces
    to its FIRST doc_id through one min-exchange, so every checkpoint
    count is one integer comparison over the vocabulary table."""
    docs = _documents(sf_dir, ["doc_id", "text"])

    def tok_first(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for did, text in zip(batch["doc_id"], batch["text"]):
            d = int(did)
            for tok in _TOKEN_RE.findall((text or "").lower()):
                prev = rows.get(tok)
                if prev is None or d < prev:
                    rows[tok] = d
        keys = list(rows)
        return pd.DataFrame(
            {
                "tok": keys,
                "first_doc": np.array([rows[t] for t in keys], dtype=np.int64),
            }
        )

    first = hash_bucket_aggregate(
        docs.map_batches(tok_first, batch_format="pandas"),
        ["tok"],
        [("first_doc", "min")],
    )
    firsts = first.map_batches(
        lambda b: pd.DataFrame({"first_doc": b["first_doc_min"].astype(np.int64)}),
        batch_format="pandas",
    ).to_pandas()["first_doc"].to_numpy(np.int64)
    doc_ids = np.sort(
        docs.map_batches(
            lambda b: pd.DataFrame({"doc_id": b["doc_id"].astype(np.int64)}),
            batch_format="pandas",
        )
        .to_pandas()["doc_id"]
        .to_numpy(np.int64)
    )
    n = doc_ids.size
    rows = []
    for p in GROWTH_CHECKPOINTS:
        thr = int(doc_ids[(p * n + 99) // 100 - 1])
        v = int((firsts <= thr).sum())
        rows.append((p, thr, v))
    return pd.DataFrame(
        rows, columns=["pct_docs", "doc_id_threshold", "vocab_seen"]
    ).astype(
        {"pct_docs": np.int64, "doc_id_threshold": np.int64, "vocab_seen": np.int64}
    )


ORACLES50["vocab_growth"] = f"""
WITH t AS (
  SELECT doc_id,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
f AS (SELECT tok, MIN(doc_id) AS first_doc FROM t GROUP BY 1),
r AS (
  SELECT doc_id,
         ROW_NUMBER() OVER (ORDER BY doc_id) AS rn,
         COUNT(*) OVER () AS cnt
  FROM documents
),
ck AS (
  SELECT p.pct, r.doc_id AS thr
  FROM (SELECT UNNEST([{", ".join(str(p) for p in GROWTH_CHECKPOINTS)}]) AS pct) p
  JOIN r ON r.rn = (p.pct * r.cnt + 99) // 100
)
SELECT CAST(ck.pct AS BIGINT) AS pct_docs,
       CAST(ck.thr AS BIGINT) AS doc_id_threshold,
       CAST(COUNT(*) FILTER (WHERE f.first_doc <= ck.thr) AS BIGINT)
         AS vocab_seen
FROM ck CROSS JOIN f
GROUP BY ck.pct, ck.thr
"""


QUERIES50["nation_revenue_per_customer"] = q_nation_revenue_per_customer
QUERIES50["vocab_growth"] = q_vocab_growth
