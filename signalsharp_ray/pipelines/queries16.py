"""Round-3 batch 18: relational decision-support shapes — TPC-H-Q18-style
large-volume orders (HAVING filter over a fact-side pre-aggregate joined
back to the order header), the cheapest-supplier-per-part argmin join
(Q2's correlated-minimum shape over the lineitem part-supplier pairs),
Q4-style late-order priority counts (an EXISTS semi-join expressed as a
per-order max-shipdate aggregate), and Heaps-law vocabulary growth per
source (the V = k*T^beta sublinearity every tokenizer-planning pipeline
checks).

House parity: quantities / prices cross exchanges as exact int64
centi-units; dates compare as epoch-microsecond integers; argmin ties
break on (price, suppkey) deterministically; the Heaps exponent is one
transcribed ln ratio over exact integer token counts (libm == DuckDB).

Scale contracts: every fact-side reduction is an in-batch partial +
one hash_bucket_aggregate exchange; order headers and supplier rows
join through co-partitioned bucketed_join (never a driver dict); the
bounded nation table is the only broadcast.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _r6away

QUERIES16: dict = {}
ORACLES16: dict = {}

QTY_THRESHOLD_C = 25_000  # 250 units in centi-quantity
LATE_LAG_US = 31_536_000_000_000  # 365 days

_TOKEN_RE = re.compile(r"\w+")


def _read(sf_dir: str, table: str, columns):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents_col(col) -> np.ndarray:
    v = np.asarray(col, dtype=np.float64) * 100.0
    return (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders
# ---------------------------------------------------------------------------


def q_large_volume_orders(sf_dir: str):
    """Orders whose total lineitem quantity exceeds 250 units, joined
    back to the order header — the Q18 shape. Per-order quantity sums
    reduce through one exchange in exact centi-quantity; the surviving
    keys (a tiny fraction) join the header co-partitioned."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "qc": _cents_col(b["l_quantity"]),
            }
        )
        .groupby("orderkey", sort=False)["qc"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_order = hash_bucket_aggregate(li, ["orderkey"], [("qc", "sum")])
    big = per_order.map_batches(
        lambda b: b[b["qc_sum"] > QTY_THRESHOLD_C], batch_format="pandas"
    )
    orders = _read(
        sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "custkey": b["o_custkey"].astype(np.int64),
                "orderdate_us": b["o_orderdate"]
                .to_numpy("datetime64[us]")
                .view(np.int64),
                "totalprice_c": _cents_col(b["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(big, orders, on=["orderkey"], how="inner")
    return joined.map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["custkey"].astype(np.int64),
                "orderkey": b["orderkey"].astype(np.int64),
                "orderdate_us": b["orderdate_us"].astype(np.int64),
                "total_qty_c": b["qc_sum"].astype(np.int64),
                "totalprice_c": b["totalprice_c"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )


ORACLES16["large_volume_orders"] = f"""
WITH q AS (
  SELECT l_orderkey,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
  FROM lineitem GROUP BY 1
  HAVING SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) > {QTY_THRESHOLD_C}
)
SELECT o.o_custkey AS custkey,
       o.o_orderkey AS orderkey,
       CAST(epoch_us(o.o_orderdate) AS BIGINT) AS orderdate_us,
       q.qc AS total_qty_c,
       CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS totalprice_c
FROM q JOIN orders o ON o.o_orderkey = q.l_orderkey
"""


# ---------------------------------------------------------------------------
# Q2 shape: cheapest supplier per part (argmin join)
# ---------------------------------------------------------------------------


def q_cheapest_supplier_per_part(sf_dir: str):
    """Per part: the supplier quoting the lowest single-lineitem
    extended price (exact cents), ties broken on suppkey — the Q2
    correlated-minimum shape over observed part-supplier pairs, with
    supplier name joined co-partitioned and the 25-row nation table
    broadcast."""
    import pyarrow.parquet as pq

    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "suppkey": b["l_suppkey"].astype(np.int64),
                "pc": _cents_col(b["l_extendedprice"]),
            }
        )
        .groupby(["partkey", "suppkey"], sort=False)["pc"]
        .min()
        .reset_index(),
        batch_format="pandas",
    )
    pair_min = hash_bucket_aggregate(li, ["partkey", "suppkey"], [("pc", "min")])

    def argmin(df: pd.DataFrame) -> pd.DataFrame:
        r = df.sort_values(["pc_min", "suppkey"]).iloc[0]
        return pd.DataFrame(
            {
                "partkey": np.array([r["partkey"]], dtype=np.int64),
                "suppkey": np.array([r["suppkey"]], dtype=np.int64),
                "min_price_c": np.array([r["pc_min"]], dtype=np.int64),
            }
        )

    best = bucketed_map_groups(pair_min, ["partkey"], argmin)
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name", "s_nationkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "suppkey": b["s_suppkey"].astype(np.int64),
                "s_name": b["s_name"],
                "nationkey": b["s_nationkey"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(best, supp, on=["suppkey"], how="inner")
    nation = pq.read_table(
        f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"]
    ).to_pandas()
    nmap = dict(
        zip(nation["n_nationkey"].astype(np.int64), nation["n_name"])
    )  # 25 rows — broadcast
    return joined.map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["partkey"].astype(np.int64),
                "suppkey": b["suppkey"].astype(np.int64),
                "s_name": b["s_name"],
                "n_name": b["nationkey"].map(nmap),
                "min_price_c": b["min_price_c"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )


ORACLES16["cheapest_supplier_per_part"] = """
WITH ps AS (
  SELECT l_partkey AS p, l_suppkey AS s,
         MIN(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS mp
  FROM lineitem GROUP BY 1, 2
),
a AS (
  SELECT p, s, mp,
         ROW_NUMBER() OVER (PARTITION BY p ORDER BY mp, s) AS rn
  FROM ps
)
SELECT a.p AS partkey, a.s AS suppkey, su.s_name, n.n_name,
       a.mp AS min_price_c
FROM a
JOIN supplier su ON su.s_suppkey = a.s
JOIN nation n ON n.n_nationkey = su.s_nationkey
WHERE a.rn = 1
"""


# ---------------------------------------------------------------------------
# Q4 shape: late-order counts per priority (EXISTS semi-join)
# ---------------------------------------------------------------------------


def q_late_order_priority(sf_dir: str):
    """Per order priority: how many orders have ANY lineitem shipped
    more than 365 days after the order date — the Q4 EXISTS shape,
    expressed as a per-order max-shipdate aggregate (EXISTS lag > T
    <=> max(shipdate) > orderdate + T) so the semi-join is one exchange
    plus an integer epoch-microsecond compare."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "ship_us": b["l_shipdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby("orderkey", sort=False)["ship_us"]
        .max()
        .reset_index(),
        batch_format="pandas",
    )
    per_order = hash_bucket_aggregate(li, ["orderkey"], [("ship_us", "max")])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "orderdate_us": b["o_orderdate"]
                .to_numpy("datetime64[us]")
                .view(np.int64),
                "priority": b["o_orderpriority"],
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(orders, per_order, on=["orderkey"], how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        late = b[b["ship_us_max"].astype(np.int64) > b["orderdate_us"] + LATE_LAG_US]
        g = late.groupby("priority", sort=False).size().reset_index(name="n")
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["priority"],
        [("n", "sum")],
    ).to_pandas()
    return pd.DataFrame(
        {"priority": agg["priority"], "n_late": agg["n_sum"].astype(np.int64)}
    ).sort_values("priority").reset_index(drop=True)


ORACLES16["late_order_priority"] = f"""
WITH m AS (
  SELECT l_orderkey, MAX(l_shipdate) AS ms FROM lineitem GROUP BY 1
)
SELECT o.o_orderpriority AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_late
FROM orders o JOIN m ON m.l_orderkey = o.o_orderkey
WHERE epoch_us(m.ms) > epoch_us(o.o_orderdate) + {LATE_LAG_US}
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Heaps-law vocabulary growth per source
# ---------------------------------------------------------------------------


def q_heaps_law_by_source(sf_dir: str):
    """Per source: total token count T, vocabulary size V, and the
    Heaps exponent estimate beta = ln(V)/ln(T) — the sublinear
    vocabulary-growth check a tokenizer-budget pipeline runs before
    committing to a vocab size. Token counts reduce through one
    (source, token) exchange; the exponent is one transcribed ln
    ratio over exact integers."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for src, text in zip(batch["source"], batch["text"]):
            for tok in _TOKEN_RE.findall((text or "").lower()):
                key = (src, tok)
                rows[key] = rows.get(key, 0) + 1
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "tok": [k[1] for k in keys],
                "m": np.array([rows[k] for k in keys], dtype=np.int64),
            }
        )

    per_tok = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "tok"],
        [("m", "sum")],
    )
    per_src = hash_bucket_aggregate(
        per_tok.map_batches(
            lambda b: pd.DataFrame(
                {
                    "source": b["source"],
                    "v": np.ones(len(b), dtype=np.int64),
                    "t": b["m_sum"].astype(np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["source"],
        [("v", "sum"), ("t", "sum")],
    ).to_pandas()
    beta = [
        float(_r6away(math.log(float(int(v))) / math.log(float(int(t)))))
        for v, t in zip(per_src["v_sum"], per_src["t_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "source": per_src["source"],
                "n_tokens": per_src["t_sum"].astype(np.int64),
                "vocab": per_src["v_sum"].astype(np.int64),
                "heaps_beta": beta,
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES16["heaps_law_by_source"] = """
WITH t AS (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
a AS (
  SELECT source, COUNT(*) AS t_total, COUNT(DISTINCT tok) AS v
  FROM t GROUP BY 1
)
SELECT source,
       CAST(t_total AS BIGINT) AS n_tokens,
       CAST(v AS BIGINT) AS vocab,
       ROUND(ln(CAST(v AS DOUBLE)) / ln(CAST(t_total AS DOUBLE)), 6) AS heaps_beta
FROM a
"""


QUERIES16["large_volume_orders"] = q_large_volume_orders
QUERIES16["cheapest_supplier_per_part"] = q_cheapest_supplier_per_part
QUERIES16["late_order_priority"] = q_late_order_priority
QUERIES16["heaps_law_by_source"] = q_heaps_law_by_source
