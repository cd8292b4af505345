"""Round-3 batch 61: duplicate-activity and catalog-vocabulary
diagnostics — same-day multi-order customers (how often a customer
places 2+ orders on one date: dedup-vs-legit signal for order
pipelines), and the top-10 part-name terms (what the catalog actually
sells, by word).

House parity: same-day detection is pure integer counting over a
(custkey, date) exchange; name terms use the house tokenizer with
(count DESC, token ASC) ties.

Scale contracts: both reduce through single exchanges; the term
top-k merges per-batch candidates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _r6away
from .queries16 import _TOKEN_RE, _read

QUERIES59: dict = {}
ORACLES59: dict = {}

NAME_TERMS_K = 10


# ---------------------------------------------------------------------------
# Same-day multi-order customers
# ---------------------------------------------------------------------------


def q_same_day_orders(sf_dir: str):
    """How many (customer, day) pairs carry 2+ orders, how many orders
    sit in such clusters, and the share of all orders — the
    double-submit / split-order signal. Exact integer counts through
    one (custkey, date) exchange."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "day_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby(["custkey", "day_us"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        orders, ["custkey", "day_us"], [("n", "sum")]
    ).to_pandas()
    total_orders = int(agg["n"].sum()) if "n" in agg else int(agg["n_sum"].sum())
    multi = agg[agg["n_sum"] >= 2]
    n_pairs = int(len(multi))
    n_clustered = int(multi["n_sum"].sum())
    return pd.DataFrame(
        {
            "n_orders": np.array([total_orders], dtype=np.int64),
            "n_multi_pairs": np.array([n_pairs], dtype=np.int64),
            "n_clustered_orders": np.array([n_clustered], dtype=np.int64),
            "clustered_share": [
                float(_r6away(float(n_clustered) / float(total_orders)))
            ],
        }
    )


ORACLES59["same_day_orders"] = """
WITH g AS (
  SELECT o_custkey, o_orderdate, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
a AS (
  SELECT CAST(SUM(n) AS BIGINT) AS total,
         CAST(COUNT(*) FILTER (WHERE n >= 2) AS BIGINT) AS pairs,
         CAST(COALESCE(SUM(n) FILTER (WHERE n >= 2), 0) AS BIGINT) AS clust
  FROM g
)
SELECT total AS n_orders,
       pairs AS n_multi_pairs,
       clust AS n_clustered_orders,
       ROUND(CAST(clust AS DOUBLE) / CAST(total AS DOUBLE), 6)
         AS clustered_share
FROM a
"""


# ---------------------------------------------------------------------------
# Top part-name terms
# ---------------------------------------------------------------------------


def q_part_name_terms(sf_dir: str, k: int = NAME_TERMS_K):
    """The 10 most common tokens in part names ((count DESC, token
    ASC) ties) with their share of all name tokens — the catalog's
    working vocabulary. One bounded exchange; per-batch top-k merge."""
    parts = _read(sf_dir, "part", ["p_name"]).map_batches(
        lambda b: _name_tok_counts(b), batch_format="pandas"
    )
    counts = hash_bucket_aggregate(parts, ["tok"], [("m", "sum")])
    agg = counts.to_pandas()
    total = int(agg["m_sum"].sum())
    top = (
        agg.sort_values(["m_sum", "tok"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    share = [
        float(_r6away(float(int(m)) / float(total))) for m in top["m_sum"]
    ]
    return pd.DataFrame(
        {
            "rank": np.arange(1, len(top) + 1, dtype=np.int64),
            "token": top["tok"],
            "n_occurrences": top["m_sum"].astype(np.int64),
            "share": share,
        }
    )


def _name_tok_counts(batch: pd.DataFrame) -> pd.DataFrame:
    rows: dict = {}
    for name in batch["p_name"]:
        for tok in _TOKEN_RE.findall((name or "").lower()):
            rows[tok] = rows.get(tok, 0) + 1
    keys = list(rows)
    return pd.DataFrame(
        {"tok": keys, "m": np.array([rows[t] for t in keys], dtype=np.int64)}
    )


ORACLES59["part_name_terms"] = f"""
WITH t AS (
  SELECT UNNEST(regexp_extract_all(lower(COALESCE(p_name, '')),
                                   '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM part
),
c AS (SELECT tok, COUNT(*) AS m FROM t GROUP BY 1),
tot AS (SELECT CAST(SUM(m) AS BIGINT) AS total FROM c),
r AS (
  SELECT tok, m,
         ROW_NUMBER() OVER (ORDER BY m DESC, tok ASC) AS rank
  FROM c
)
SELECT CAST(r.rank AS BIGINT) AS rank,
       r.tok AS token,
       CAST(r.m AS BIGINT) AS n_occurrences,
       ROUND(CAST(r.m AS DOUBLE) / CAST(tot.total AS DOUBLE), 6) AS share
FROM r CROSS JOIN tot
WHERE r.rank <= {NAME_TERMS_K}
"""


QUERIES59["same_day_orders"] = q_same_day_orders
QUERIES59["part_name_terms"] = q_part_name_terms
