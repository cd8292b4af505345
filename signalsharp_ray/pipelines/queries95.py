"""Round-3 batch 97: lexical inequality and pricing-audit operators —
the Gini coefficient of the corpus token-frequency distribution (how
head-heavy is the vocabulary, the inequality companion to zipf_fit),
the round-number bias of order totals (share of whole-dollar /
whole-ten-dollar prices — synthetic pricing fingerprint), and the
retail-vs-observed unit price gap (how often shipments price above the
catalog's retail price).

House parity: the vocabulary Gini is the gini_traffic integer
rank-weighted sum over (count, token)-ordered frequencies; round-number
shares are exact integer modulo predicates on cents; the price gap
compares half-away unit cents against exact retail cents per item.

Scale contracts: all three reduce through one exchange; the Gini
combine is vocabulary-bounded; the gap broadcasts the part dimension.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _r6away
from .queries16 import _read
from .queries42 import _unit_cents
from .queries94 import _token_counts

QUERIES95: dict = {}
ORACLES95: dict = {}


# ---------------------------------------------------------------------------
# Vocabulary Gini
# ---------------------------------------------------------------------------


def q_token_gini(sf_dir: str):
    """One global row: Gini of the token-frequency distribution over
    the corpus vocabulary — ranks follow (count, token) ascending;
    G = 2W/(nS) - (n+1)/n with W the exact integer rank-weighted sum."""
    agg = (
        _token_counts(sf_dir, by_source=False)
        .to_pandas()
        .sort_values(["n_sum", "tok"], kind="mergesort")
    )
    out_empty = pd.DataFrame(
        {"n_terms": pd.Series(dtype=np.int64),
         "n_tokens": pd.Series(dtype=np.int64),
         "gini": pd.Series(dtype=np.float64)}
    )
    n = len(agg)
    if n == 0:
        return out_empty
    c = agg["n_sum"].to_numpy(np.int64)
    s = int(c.sum())
    w = int(np.sum(np.arange(1, n + 1, dtype=np.int64) * c))
    g = (2.0 * float(w)) / (float(n) * float(s)) - float(n + 1) / float(n)
    return pd.DataFrame(
        {
            "n_terms": np.array([n], dtype=np.int64),
            "n_tokens": np.array([s], dtype=np.int64),
            "gini": [float(_r6away(g))],
        }
    )


ORACLES95["token_gini"] = """
WITH t AS (
  SELECT UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
c AS (SELECT tok, COUNT(*) AS n FROM t GROUP BY 1),
rk AS (
  SELECT n, row_number() OVER (ORDER BY n ASC, tok ASC) AS r FROM c
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_terms,
       CAST(SUM(n) AS BIGINT) AS n_tokens,
       ROUND((2.0 * CAST(SUM(r * n) AS DOUBLE))
             / (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(n) AS DOUBLE))
             - CAST(COUNT(*) + 1 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS gini
FROM rk
"""


# ---------------------------------------------------------------------------
# Round-number bias of order totals
# ---------------------------------------------------------------------------


def q_round_price_bias(sf_dir: str):
    """One global row: share of order totals that are whole dollars and
    whole ten-dollars (exact cents modulo) plus the uniform-null
    expectations (1/100, 1/1000) they should sit near without bias."""
    orders = _read(sf_dir, "orders", ["o_totalprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["o_totalprice"].to_numpy(np.float64) * 100
        cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return pd.DataFrame(
            {
                "n": np.array([len(cents)], dtype=np.int64),
                "d": np.array([int((cents % 100 == 0).sum())], dtype=np.int64),
                "t": np.array(
                    [int((cents % 1000 == 0).sum())], dtype=np.int64
                ),
            }
        )

    parts = orders.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    out_empty = pd.DataFrame(
        {"n_orders": pd.Series(dtype=np.int64),
         "whole_dollar_share": pd.Series(dtype=np.float64),
         "whole_ten_share": pd.Series(dtype=np.float64)}
    )
    if n == 0:
        return out_empty
    d = int(parts["d"].sum())
    t = int(parts["t"].sum())
    return pd.DataFrame(
        {
            "n_orders": np.array([n], dtype=np.int64),
            "whole_dollar_share": [float(_r6away(float(d) / float(n)))],
            "whole_ten_share": [float(_r6away(float(t) / float(n)))],
        }
    )


ORACLES95["round_price_bias"] = """
WITH c AS (
  SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(COUNT(*) FILTER (WHERE cents % 100 = 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS whole_dollar_share,
       ROUND(CAST(COUNT(*) FILTER (WHERE cents % 1000 = 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS whole_ten_share
FROM c
"""


# ---------------------------------------------------------------------------
# Retail vs observed unit price gap
# ---------------------------------------------------------------------------


def q_retail_unit_price_gap(sf_dir: str):
    """One global row: lineitem count, the share of items whose
    observed unit price (half-away cents of extendedprice/quantity)
    exceeds the part's retail price, and the mean unit/retail ratio
    (exact integer sums; the ratio averages cross-multiplied exact
    cents through one float fold... simplified to sum-of-units over
    sum-of-retail, a ratio of two exact integer totals)."""
    # scale shape: the per-item up > retail comparison needs every
    # lineitem against its part's retail price, so lineitem flows through
    # ONE co-partitioned bucketed_join with the part projection — never a
    # driver dict (part is O(sf)); the moment sums reduce per batch
    from ..common.raytools import bucketed_join

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_quantity"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "up": _unit_cents(
                    b["l_extendedprice"].to_numpy(np.float64),
                    b["l_quantity"].to_numpy(np.float64),
                ),
            }
        ),
        batch_format="pandas",
    )

    def part_cents(b: pd.DataFrame) -> pd.DataFrame:
        v = b["p_retailprice"].to_numpy(np.float64) * 100
        return pd.DataFrame(
            {
                "partkey": b["p_partkey"].astype(np.int64),
                "rc": (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(
                    np.int64
                ),
            }
        )

    dim = _read(sf_dir, "part", ["p_partkey", "p_retailprice"]).map_batches(
        part_cents, batch_format="pandas"
    )
    joined = bucketed_join(li, dim, on=["partkey"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        up = batch["up"].astype(np.int64).to_numpy()
        retail = batch["rc"].astype(np.int64).to_numpy()
        return pd.DataFrame(
            {
                "n": np.array([len(up)], dtype=np.int64),
                "above": np.array([int((up > retail).sum())], dtype=np.int64),
                "su": np.array([int(up.sum())], dtype=np.int64),
                "sr": np.array([int(retail.sum())], dtype=np.int64),
            }
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    out_empty = pd.DataFrame(
        {"n_items": pd.Series(dtype=np.int64),
         "above_retail_share": pd.Series(dtype=np.float64),
         "unit_retail_ratio": pd.Series(dtype=np.float64)}
    )
    if n == 0:
        return out_empty
    above = int(parts["above"].sum())
    su = int(parts["su"].sum())
    sr = int(parts["sr"].sum())
    if sr == 0:
        return out_empty
    return pd.DataFrame(
        {
            "n_items": np.array([n], dtype=np.int64),
            "above_retail_share": [float(_r6away(float(above) / float(n)))],
            "unit_retail_ratio": [float(_r6away(float(su) / float(sr)))],
        }
    )


ORACLES95["retail_unit_price_gap"] = """
WITH b AS (
  SELECT CAST(ROUND(l.l_extendedprice / l.l_quantity * 100.0) AS BIGINT)
           AS up,
         CAST(ROUND(p.p_retailprice * 100) AS BIGINT) AS rc
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(COUNT(*) FILTER (WHERE up > rc) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS above_retail_share,
       ROUND(CAST(SUM(up) AS DOUBLE) / CAST(SUM(rc) AS DOUBLE), 6)
         AS unit_retail_ratio
FROM b
HAVING SUM(rc) != 0
"""


QUERIES95["token_gini"] = q_token_gini
QUERIES95["round_price_bias"] = q_round_price_bias
QUERIES95["retail_unit_price_gap"] = q_retail_unit_price_gap
