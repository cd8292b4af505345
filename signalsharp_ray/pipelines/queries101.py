"""Round-3 batch 103: logistics and payment-pattern operators — the
correlation between part size and shipped quantity (do bulky parts
move in smaller lots), the whole-dollar share of event values per type
(synthetic-metric fingerprint at the event level), and supplier
account-balance statistics per nation.

House parity: all Pearson terms are exact integers (size, rounded
quantity) with HUGEINT-safe products; round-value predicates are exact
cents modulo; balances are exact cents with two transcribed divisions.

Scale contracts: the correlation broadcasts the part dimension and
reduces partial+final; the other two are bounded aggregates.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES101: dict = {}
ORACLES101: dict = {}


# ---------------------------------------------------------------------------
# Part size vs shipped quantity correlation
# ---------------------------------------------------------------------------


def q_size_quantity_corr(sf_dir: str):
    """One global row: Pearson correlation between p_size and the
    rounded shipped quantity over lineitems."""
    from ..common.raytools import bucketed_join

    # scale shape: lineitem pre-reduces per partkey (n, sum q, sum q^2 —
    # all exact ints), only |part| rows cross the join exchange, and the
    # global moments recombine exactly: ss = sum(s_k * n_k),
    # sss = sum(s_k^2 * n_k), ssq = sum(s_k * sq_k). No driver dict.
    def per_part(batch: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(batch["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "partkey": batch["l_partkey"].astype(np.int64),
                    "n": np.ones(len(q), dtype=np.int64),
                    "sq": q,
                    "sqq": q * q,
                }
            )
            .groupby("partkey", sort=False)
            .sum()
            .reset_index()
        )

    per_key = hash_bucket_aggregate(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"]).map_batches(
            per_part, batch_format="pandas"
        ),
        ["partkey"],
        [("n", "sum"), ("sq", "sum"), ("sqq", "sum")],
    )
    dim = _read(sf_dir, "part", ["p_partkey", "p_size"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["p_partkey"].astype(np.int64),
                "s": b["p_size"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_key, dim, on=["partkey"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        s = batch["s"].astype(np.int64).to_numpy()
        nk = batch["n_sum"].astype(np.int64).to_numpy()
        sqk = batch["sq_sum"].astype(np.int64).to_numpy()
        sqqk = batch["sqq_sum"].astype(np.int64).to_numpy()
        return pd.DataFrame(
            {
                "n": np.array([int(nk.sum())], dtype=np.int64),
                "ss": np.array([int((s * nk).sum())], dtype=np.int64),
                "sq": np.array([int(sqk.sum())], dtype=np.int64),
                "sss": np.array([int((s * s * nk).sum())], dtype=np.int64),
                "sqq": np.array([int(sqqk.sum())], dtype=np.int64),
                "ssq": np.array([int((s * sqk).sum())], dtype=np.int64),
            }
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    out_empty = pd.DataFrame(
        {"n_items": pd.Series(dtype=np.int64),
         "r": pd.Series(dtype=np.float64)}
    )
    n = int(parts["n"].sum())
    if n < 2:
        return out_empty
    ss, sq = int(parts["ss"].sum()), int(parts["sq"].sum())
    sss, sqq, ssq = (
        int(parts["sss"].sum()),
        int(parts["sqq"].sum()),
        int(parts["ssq"].sum()),
    )
    ds_ = float(n * sss - ss * ss)
    dq = float(n * sqq - sq * sq)
    if ds_ <= 0.0 or dq <= 0.0:
        return out_empty
    r = float(n * ssq - ss * sq) / (math.sqrt(ds_) * math.sqrt(dq))
    return pd.DataFrame(
        {"n_items": np.array([n], dtype=np.int64), "r": [float(_r6away(r))]}
    )


ORACLES101["size_quantity_corr"] = """
WITH b AS (
  SELECT CAST(p.p_size AS BIGINT) AS s,
         CAST(ROUND(l.l_quantity) AS BIGINT) AS q
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
),
a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(s) AS BIGINT) AS ss, CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(s*s) AS BIGINT) AS sss, CAST(SUM(q*q) AS BIGINT) AS sqq,
         CAST(SUM(s*q) AS BIGINT) AS ssq
  FROM b
)
SELECT CAST(n AS BIGINT) AS n_items,
       ROUND(CAST(CAST(n AS HUGEINT) * ssq - CAST(ss AS HUGEINT) * sq
                  AS DOUBLE)
             / (sqrt(CAST(CAST(n AS HUGEINT) * sss
                          - CAST(ss AS HUGEINT) * ss AS DOUBLE))
                * sqrt(CAST(CAST(n AS HUGEINT) * sqq
                            - CAST(sq AS HUGEINT) * sq AS DOUBLE))), 6) AS r
FROM a
WHERE n >= 2
  AND CAST(n AS HUGEINT) * sss - CAST(ss AS HUGEINT) * ss > 0
  AND CAST(n AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq > 0
"""


# ---------------------------------------------------------------------------
# Whole-dollar value share per type
# ---------------------------------------------------------------------------


def q_value_round_share_by_type(sf_dir: str):
    """Per event_type: event count and the share with whole-dollar
    values (centivalue % 100 == 0)."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = _cents(batch["value"])
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "n": np.ones(len(c), dtype=np.int64),
                    "w": (c % 100 == 0).astype(np.int64),
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
            [("n", "sum"), ("w", "sum")],
        )
        .to_pandas()
        .sort_values("event_type")
    )
    return pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "n_events": agg["n_sum"].astype(np.int64),
            "n_whole_dollar": agg["w_sum"].astype(np.int64),
            "whole_share": _r6away(
                agg["w_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES101["value_round_share_by_type"] = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(*) FILTER (
         WHERE CAST(ROUND(value * 100) AS BIGINT) % 100 = 0
       ) AS BIGINT) AS n_whole_dollar,
       ROUND(CAST(COUNT(*) FILTER (
               WHERE CAST(ROUND(value * 100) AS BIGINT) % 100 = 0
             ) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS whole_share
FROM events GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Supplier balances by nation
# ---------------------------------------------------------------------------


def q_supplier_balance_by_nation(sf_dir: str):
    """Per nation: supplier count, mean account balance, negative-balance
    share — the supplier-side mirror of mktsegment_balance_stats."""
    supp = _read(sf_dir, "supplier", ["s_nationkey", "s_acctbal"])
    nation = (
        _read(sf_dir, "nation", ["n_nationkey", "n_name"])
        .to_pandas()
        .set_index("n_nationkey")["n_name"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(batch["s_acctbal"])
        return (
            pd.DataFrame(
                {
                    "nationkey": batch["s_nationkey"].astype(np.int64),
                    "n": np.ones(len(cents), dtype=np.int64),
                    "cents": cents,
                    "neg": (cents < 0).astype(np.int64),
                }
            )
            .groupby("nationkey", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            supp.map_batches(partial, batch_format="pandas"),
            ["nationkey"],
            [("n", "sum"), ("cents", "sum"), ("neg", "sum")],
        )
        .to_pandas()
    )
    agg["nation"] = agg["nationkey"].astype(np.int64).map(nation).astype(str)
    agg = agg.sort_values("nation")
    return pd.DataFrame(
        {
            "nation": agg["nation"],
            "n_suppliers": agg["n_sum"].astype(np.int64),
            "mean_balance": _r6away(
                agg["cents_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
                / 100.0
            ),
            "negative_share": _r6away(
                agg["neg_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES101["supplier_balance_by_nation"] = """
WITH b AS (
  SELECT n.n_name AS nation,
         CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS cents
  FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0,
             6) AS mean_balance,
       ROUND(CAST(COUNT(*) FILTER (WHERE cents < 0) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS negative_share
FROM b GROUP BY 1
"""


QUERIES101["size_quantity_corr"] = q_size_quantity_corr
QUERIES101["value_round_share_by_type"] = q_value_round_share_by_type
QUERIES101["supplier_balance_by_nation"] = q_supplier_balance_by_nation
