"""Round-3 batch 9: the TPC-H join-pattern suite the earlier batches had
not covered — conditional-ratio dimension rollups (Q14 shape), correlated
per-key-average filters (Q17), global-argmax-with-ties (Q15), anti-join
against a recency set with a cross-multiplied global-average predicate
(Q22), OR-of-conjunctions dimension predicates (Q19), and the
sole-late-supplier multi-level exists/not-exists pattern (Q21).

All six are adapted to the sandbox schema (no partsupp / commitdate /
receiptdate: "late" means shipped > 90 days after the order date, and
"idle" means no order since 2000-01-01 — every customer at these SFs has
SOME order, so the canonical never-ordered anti-join would be vacuously
empty; see customers_without_orders for the zero-count-row variant).

Parity style (house rules): money crosses every exchange as exact int64
cents x basis-points (price_c * (10000 - disc_bp), the tpch_q6_revenue
contract); quantities are exact int64; correlated-average comparisons are
cross-multiplied into pure-integer predicates (5*q*n < sum_q, b*n > s) so
no float division happens before the single final ROUND on both engines.

Scale contracts: every join is a co-partitioned bucketed exchange
(bucketed_join) — neither side is ever collected on the driver; the only
driver-resident values are single global scalars (one (sum, count) pair,
one argmax revenue) and catalog-bounded final results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _r6away
from .queries4 import _cents

QUERIES7: dict = {}
ORACLES7: dict = {}


def _read(sf_dir: str, table: str, columns, filter=None):
    import ray.data as rd

    return rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns, filter=filter)


def _rev_cbp(price, discount) -> np.ndarray:
    """Exact int64 revenue in cents x basis-points: price_c * (10000 - bp).
    Same encoding as tpch_q6_revenue; divide by 1e6 only at the very end."""
    c = _cents(price)
    bp = np.rint(np.asarray(discount, dtype=np.float64) * 10000).astype(np.int64)
    return c * (10000 - bp)


# ---------------------------------------------------------------------------
# Q14 shape: monthly promo revenue share
# ---------------------------------------------------------------------------


def q_promo_revenue_share(sf_dir: str):
    """Monthly revenue share of PROMO-type parts across 1996 — the
    conditional-ratio dimension rollup (TPC-H Q14 shape): join the fact
    table to a part attribute, split revenue by the attribute, emit the
    percentage per month.

    Plan: the 1996 date window is pushed into the parquet scan; part is
    projected to (partkey, is_promo) before ONE bucketed exchange on
    partkey; monthly promo/total sums reduce as exact int64 cbp through a
    tiny month-keyed exchange. The share is one float division per month,
    rounded once — transcribed op-for-op against the oracle."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")
    li = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_partkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "month_id": (
                    b["l_shipdate"].dt.year * 100 + b["l_shipdate"].dt.month
                ).astype(np.int64),
                "rev_cbp": _rev_cbp(b["l_extendedprice"], b["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    part = _read(sf_dir, "part", ["p_partkey", "p_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["p_partkey"].astype(np.int64),
                "is_promo": (b["p_type"] == "PROMO").astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(li, part, on=["partkey"], how="inner")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.assign(promo_cbp=batch["rev_cbp"] * batch["is_promo"]).groupby(
            "month_id", sort=False
        )
        out = g.agg(promo_cbp=("promo_cbp", "sum"), total_cbp=("rev_cbp", "sum"))
        return out.reset_index().astype(np.int64)

    agg = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["month_id"],
        [("promo_cbp", "sum"), ("total_cbp", "sum")],
    ).to_pandas()  # months-bounded
    p = agg["promo_cbp_sum"].to_numpy(np.int64).astype(np.float64)
    t = agg["total_cbp_sum"].to_numpy(np.int64).astype(np.float64)
    return pd.DataFrame(
        {
            "month_id": agg["month_id"].astype(np.int64),
            "promo_share_pct": _r6away(100.0 * p / t),
            "total_revenue": _r6away(t / 1000000.0),
        }
    )


ORACLES7["promo_revenue_share"] = """
WITH l AS (
  SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate) AS BIGINT) AS month_id,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_cbp,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
),
m AS (
  SELECT month_id,
         CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev_cbp ELSE 0 END) AS BIGINT) AS promo_cbp,
         CAST(SUM(rev_cbp) AS BIGINT) AS total_cbp
  FROM l GROUP BY 1
)
SELECT month_id,
       ROUND(100.0 * CAST(promo_cbp AS DOUBLE) / CAST(total_cbp AS DOUBLE), 6) AS promo_share_pct,
       ROUND(CAST(total_cbp AS DOUBLE) / 1000000.0, 6) AS total_revenue
FROM m
"""


# ---------------------------------------------------------------------------
# Q17 shape: revenue of small-quantity lineitems vs per-part average
# ---------------------------------------------------------------------------


def q_small_qty_revenue(sf_dir: str, brand: str = "Brand#23"):
    """Total revenue of Brand#23 lineitems whose quantity is below 20% of
    that part's own average quantity — the correlated-subquery pattern
    (TPC-H Q17): a fact table filtered against an aggregate of itself,
    keyed per part.

    Plan: the brand filter shrinks part to a key list BEFORE the fact
    join (semi-join through one bucketed exchange); per-part (sum_q, n)
    reduces through a second exchange on the same key; the correlated
    comparison is cross-multiplied to pure integers (5*q*n < sum_q, exact
    because quantities are integral), so the only float is the final
    cents -> currency division. Single-row output even on an empty match."""
    li = _read(
        sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "q": np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64),
                "c": _cents(b["l_extendedprice"]),
            }
        ),
        batch_format="pandas",
    )
    keys = _read(sf_dir, "part", ["p_partkey", "p_brand"]).map_batches(
        lambda b: pd.DataFrame(
            {"partkey": b.loc[b["p_brand"] == brand, "p_partkey"].astype(np.int64)}
        ),
        batch_format="pandas",
    )
    l = bucketed_join(li, keys, on=["partkey"], how="inner")
    per_part = hash_bucket_aggregate(
        l.map_batches(
            lambda b: b.groupby("partkey", sort=False)
            .agg(sq=("q", "sum"), n=("q", "size"))
            .reset_index()
            .astype(np.int64),
            batch_format="pandas",
        ),
        ["partkey"],
        [("sq", "sum"), ("n", "sum")],
    )
    both = bucketed_join(l, per_part, on=["partkey"], how="inner")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = 5 * batch["q"] * batch["n_sum"] < batch["sq_sum"]
        return pd.DataFrame(
            {
                "c": np.array([int(batch.loc[keep, "c"].sum())], dtype=np.int64),
                "n": np.array([int(keep.sum())], dtype=np.int64),
            }
        )

    parts = both.map_batches(partial, batch_format="pandas").to_pandas()
    total = int(parts["c"].sum()) if len(parts) else 0
    n = int(parts["n"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "revenue": _r6away(float(total) / 100.0),
            "n_items": np.array([n], dtype=np.int64),
        }
    )


ORACLES7["small_qty_revenue"] = """
WITH l AS (
  SELECT l_partkey, CAST(l_quantity AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS c
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#23'
),
a AS (SELECT l_partkey, SUM(q) AS sq, COUNT(*) AS n FROM l GROUP BY 1)
SELECT ROUND(CAST(COALESCE(SUM(c), 0) AS DOUBLE) / 100.0, 6) AS revenue,
       COUNT(*) AS n_items
FROM l JOIN a USING (l_partkey)
WHERE 5 * q * n < sq
"""


# ---------------------------------------------------------------------------
# Q15 shape: top-revenue supplier(s) in a quarter, ties kept
# ---------------------------------------------------------------------------


def q_top_supplier_window(sf_dir: str):
    """Supplier(s) with the maximum revenue over 1996 Q1 — the
    global-argmax-with-ties pattern (TPC-H Q15's top_supplier view).

    Plan: the quarter is pushed into the scan; per-supplier revenue
    reduces as exact int64 cbp through one supplier-keyed exchange; the
    global max is ONE scalar reduced per batch and carried to the driver
    (never the per-supplier table, which is catalog-sized at web scale);
    winners are filtered distributed and only then joined to supplier
    names through a co-partitioned exchange."""
    import pyarrow.dataset as pads

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")
    li = _read(
        sf_dir,
        "lineitem",
        ["l_shipdate", "l_suppkey", "l_extendedprice", "l_discount"],
        filter=(pads.field("l_shipdate") >= lo) & (pads.field("l_shipdate") < hi),
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "suppkey": b["l_suppkey"].astype(np.int64),
                "rev_cbp": _rev_cbp(b["l_extendedprice"], b["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    per_supp = hash_bucket_aggregate(
        li.map_batches(
            lambda b: b.groupby("suppkey", sort=False)
            .agg(rev_cbp=("rev_cbp", "sum"))
            .reset_index()
            .astype(np.int64),
            batch_format="pandas",
        ),
        ["suppkey"],
        [("rev_cbp", "sum")],
    ).materialize()  # consumed twice: max scan + winner filter
    mx_parts = per_supp.map_batches(
        lambda b: pd.DataFrame({"m": np.array([int(b["rev_cbp_sum"].max())])})
        if len(b)
        else pd.DataFrame({"m": np.array([], dtype=np.int64)}),
        batch_format="pandas",
    ).to_pandas()
    mx = int(mx_parts["m"].max())
    winners = per_supp.filter(expr=f"rev_cbp_sum == {mx}")
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda b: pd.DataFrame(
            {"suppkey": b["s_suppkey"].astype(np.int64), "s_name": b["s_name"]}
        ),
        batch_format="pandas",
    )
    out = bucketed_join(winners, supp, on=["suppkey"], how="inner").to_pandas()
    return pd.DataFrame(
        {
            "s_suppkey": out["suppkey"].astype(np.int64),
            "s_name": out["s_name"].astype(str),
            "revenue": _r6away(
                out["rev_cbp_sum"].to_numpy(np.int64).astype(np.float64) / 1000000.0
            ),
        }
    )


ORACLES7["top_supplier_window"] = """
WITH r AS (
  SELECT l_suppkey,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT))) AS BIGINT) AS rev_cbp
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s_suppkey, s_name,
       ROUND(CAST(rev_cbp AS DOUBLE) / 1000000.0, 6) AS revenue
FROM r JOIN supplier ON l_suppkey = s_suppkey
QUALIFY rev_cbp = MAX(rev_cbp) OVER ()
"""


# ---------------------------------------------------------------------------
# Q22 shape: rich customers with no recent orders, per nation
# ---------------------------------------------------------------------------


def q_rich_idle_customers(sf_dir: str):
    """Per-nation count and balance of customers whose account balance is
    above the positive-balance average AND who placed no order since
    2000-01-01 — the anti-join + global-average pattern (TPC-H Q22,
    recency-adapted because every customer at these SFs has some order).

    Plan: the global (sum, count) over positive balances is ONE scalar
    pair (per-batch partials, driver-merged, broadcast back inside the
    filter closure — never a table); the above-average test is
    cross-multiplied to integers (b*n > s, exact); the recent-orderer set
    stays distributed and anti-joins through a co-partitioned LEFT
    exchange; the per-nation rollup is nation-bounded."""
    import pyarrow.dataset as pads

    cust = _read(
        sf_dir, "customer", ["c_custkey", "c_nationkey", "c_acctbal"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["c_custkey"].astype(np.int64),
                "nationkey": b["c_nationkey"].astype(np.int64),
                "b": _cents(b["c_acctbal"]),
            }
        ),
        batch_format="pandas",
    ).materialize()  # consumed twice: global scalar + filtered anti-join
    g = cust.map_batches(
        lambda b: pd.DataFrame(
            {
                "s": np.array([int(b.loc[b["b"] > 0, "b"].sum())], dtype=np.int64),
                "n": np.array([int((b["b"] > 0).sum())], dtype=np.int64),
            }
        ),
        batch_format="pandas",
    ).to_pandas()
    s, n = int(g["s"].sum()), int(g["n"].sum())

    rich = cust.map_batches(
        lambda b: b[b["b"] * n > s], batch_format="pandas"
    )
    recent = _read(
        sf_dir,
        "orders",
        ["o_custkey", "o_orderdate"],
        filter=pads.field("o_orderdate") >= pd.Timestamp("2000-01-01"),
    ).map_batches(
        lambda b: pd.DataFrame(
            {"custkey": b["o_custkey"].unique().astype(np.int64)}
        ).assign(has_recent=np.int64(1)),
        batch_format="pandas",
    )
    recent = hash_bucket_aggregate(recent, ["custkey"], [("has_recent", "max")])
    joined = bucketed_join(rich, recent, on=["custkey"], how="left")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        idle = batch[batch["has_recent_max"].isna()]
        out = (
            idle.groupby("nationkey", sort=False)
            .agg(n_custs=("b", "size"), bal=("b", "sum"))
            .reset_index()
        )
        return out.astype(np.int64)

    agg = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["nationkey"],
        [("n_custs", "sum"), ("bal", "sum")],
    ).to_pandas()  # nation-bounded
    return pd.DataFrame(
        {
            "nationkey": agg["nationkey"].astype(np.int64),
            "n_custs": agg["n_custs_sum"].astype(np.int64),
            "total_acctbal": _r6away(
                agg["bal_sum"].to_numpy(np.int64).astype(np.float64) / 100.0
            ),
        }
    )


ORACLES7["rich_idle_customers"] = """
WITH c AS (
  SELECT c_custkey, c_nationkey, CAST(ROUND(c_acctbal * 100) AS BIGINT) AS b
  FROM customer
),
g AS (SELECT CAST(SUM(b) AS BIGINT) AS s, COUNT(*) AS n FROM c WHERE b > 0),
idle AS (
  SELECT c.c_nationkey, c.b FROM c, g
  WHERE c.b * g.n > g.s
    AND NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey
        AND o.o_orderdate >= TIMESTAMP '2000-01-01'
    )
)
SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
       COUNT(*) AS n_custs,
       ROUND(CAST(SUM(b) AS DOUBLE) / 100.0, 6) AS total_acctbal
FROM idle GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Q19 shape: OR-of-conjunctions dimension predicate revenue
# ---------------------------------------------------------------------------


def q_disjunctive_revenue(sf_dir: str):
    """Revenue matched by THREE brand/size/quantity conjunctions OR-ed
    together (TPC-H Q19 shape) — the disjunctive multi-attribute predicate
    that defeats naive single-column pushdown.

    Plan: part is pre-filtered to the three brands BEFORE the exchange
    (the only rows whose attributes can satisfy any branch), the shared
    quantity envelope (q <= 30) IS pushed into the fact scan, and the
    residual disjunction evaluates vectorized after one bucketed join.
    Revenue reduces as a single exact int64 per batch."""
    import pyarrow.dataset as pads

    branches = [
        ("Brand#13", 15, 1, 11),
        ("Brand#23", 25, 10, 20),
        ("Brand#20", 35, 20, 30),
    ]
    li = _read(
        sf_dir,
        "lineitem",
        ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
        filter=pads.field("l_quantity") <= 30,
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "q": np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64),
                "rev_cbp": _rev_cbp(b["l_extendedprice"], b["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    brands = tuple(b for b, *_ in branches)
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b.loc[b["p_brand"].isin(brands), "p_partkey"].astype(
                    np.int64
                ),
                "brand": b.loc[b["p_brand"].isin(brands), "p_brand"],
                "size": b.loc[b["p_brand"].isin(brands), "p_size"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(li, part, on=["partkey"], how="inner")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = np.zeros(len(batch), dtype=bool)
        for brand, max_size, qlo, qhi in branches:
            keep |= (
                (batch["brand"] == brand).to_numpy()
                & (batch["size"].to_numpy() >= 1)
                & (batch["size"].to_numpy() <= max_size)
                & (batch["q"].to_numpy() >= qlo)
                & (batch["q"].to_numpy() <= qhi)
            )
        return pd.DataFrame(
            {
                "rev": np.array(
                    [int(batch.loc[keep, "rev_cbp"].sum())], dtype=np.int64
                ),
                "n": np.array([int(keep.sum())], dtype=np.int64),
            }
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    total = int(parts["rev"].sum()) if len(parts) else 0
    n = int(parts["n"].sum()) if len(parts) else 0
    return pd.DataFrame(
        {
            "revenue": _r6away(float(total) / 1000000.0),
            "n_items": np.array([n], dtype=np.int64),
        }
    )


ORACLES7["disjunctive_revenue"] = """
WITH l AS (
  SELECT CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rev_cbp
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE (p_brand = 'Brand#13' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
     OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
     OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
)
SELECT ROUND(CAST(COALESCE(SUM(rev_cbp), 0) AS DOUBLE) / 1000000.0, 6) AS revenue,
       COUNT(*) AS n_items
FROM l
"""


# ---------------------------------------------------------------------------
# Q21 shape: the sole late supplier on multi-supplier orders
# ---------------------------------------------------------------------------


def q_sole_late_supplier(sf_dir: str):
    """Per supplier: on how many multi-supplier orders was it the ONLY
    supplier that shipped late (> 90 days after the order date)? The
    TPC-H Q21 exists/not-exists pattern, the classic blame-assignment
    query.

    Plan: lineitem joins orders through one orderkey exchange to flag
    lateness; (orderkey, suppkey) late flags reduce by max; per-order
    (n_supp, n_late) reduce on the same key; one more co-partitioned join
    aligns the supplier-level flags with the order-level counts; the
    winner filter (late & n_late = 1 & n_supp >= 2) is pure-integer; the
    per-supplier count is catalog-bounded and joins names distributed."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_shipdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "suppkey": b["l_suppkey"].astype(np.int64),
                "ship_us": b["l_shipdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        ),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "od_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        ),
        batch_format="pandas",
    )
    DAY_US = 86_400_000_000
    flagged = bucketed_join(li, orders, on=["orderkey"], how="inner").map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["orderkey"],
                "suppkey": b["suppkey"],
                "late": (b["ship_us"] > b["od_us"] + 90 * DAY_US).astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    ls = hash_bucket_aggregate(
        flagged, ["orderkey", "suppkey"], [("late", "max")]
    ).map_batches(
        lambda b: b.assign(one=np.int64(1)), batch_format="pandas"
    ).materialize()  # consumed twice: per-order counts + winner filter
    po = hash_bucket_aggregate(
        ls, ["orderkey"], [("one", "sum"), ("late_max", "sum")]
    ).rename_columns({"one_sum": "n_supp", "late_max_sum": "n_late"})
    both = bucketed_join(ls, po, on=["orderkey"], how="inner")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        keep = (
            (batch["late_max"] == 1) & (batch["n_late"] == 1) & (batch["n_supp"] >= 2)
        )
        g = batch.loc[keep].groupby("suppkey", sort=False).size()
        return pd.DataFrame(
            {
                "suppkey": g.index.to_numpy(np.int64),
                "numwait": g.to_numpy(np.int64),
            }
        )

    per_supp = hash_bucket_aggregate(
        both.map_batches(partial, batch_format="pandas"),
        ["suppkey"],
        [("numwait", "sum")],
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]).map_batches(
        lambda b: pd.DataFrame(
            {"suppkey": b["s_suppkey"].astype(np.int64), "s_name": b["s_name"]}
        ),
        batch_format="pandas",
    )
    out = bucketed_join(per_supp, supp, on=["suppkey"], how="inner").to_pandas()
    return pd.DataFrame(
        {
            "s_suppkey": out["suppkey"].astype(np.int64),
            "s_name": out["s_name"].astype(str),
            "numwait": out["numwait_sum"].astype(np.int64),
        }
    )


ORACLES7["sole_late_supplier"] = """
WITH ls AS (
  SELECT l.l_orderkey, l.l_suppkey,
         MAX(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
                  THEN 1 ELSE 0 END) AS late
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
po AS (
  SELECT l_orderkey, COUNT(*) AS n_supp, SUM(late) AS n_late
  FROM ls GROUP BY 1
)
SELECT s_suppkey, s_name, COUNT(*) AS numwait
FROM ls JOIN po USING (l_orderkey) JOIN supplier ON l_suppkey = s_suppkey
WHERE ls.late = 1 AND po.n_late = 1 AND po.n_supp >= 2
GROUP BY 1, 2
"""


QUERIES7["promo_revenue_share"] = q_promo_revenue_share
QUERIES7["small_qty_revenue"] = q_small_qty_revenue
QUERIES7["top_supplier_window"] = q_top_supplier_window
QUERIES7["rich_idle_customers"] = q_rich_idle_customers
QUERIES7["disjunctive_revenue"] = q_disjunctive_revenue
QUERIES7["sole_late_supplier"] = q_sole_late_supplier
