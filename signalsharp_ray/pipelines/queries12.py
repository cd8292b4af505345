"""Round-3 batch 14: market structure analytics — national market share
within a region (TPC-H Q8 shape, all supplier nations at once),
supplier diversity per part type (Q16-shaped count-distinct over
relationship pairs), and two inequality measures of hourly load
(Herfindahl-Hirschman concentration and the exact integer-numerator
Gini).

House parity: revenue crosses exchanges as exact int64 cents x
basis-points; count-distinct reduces through exact key-deduplicating
exchanges; HHI and Gini are single transcribed float expressions over
exact integer sums (the Gini numerator sum((2i - n - 1)·v_(i)) is
computed entirely in int64 with a deterministic (value, hour) sort).

Scale contracts: the fact-side joins are co-partitioned bucketed
exchanges (orderkey -> custkey -> suppkey); nation/region are
fixed-25/5-row dimensions broadcast as plain dicts; per-(type, hour)
and per-(year, nation) outputs are catalog-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _r6away
from .queries6 import _hourly_counts
from .queries7 import _read, _rev_cbp

QUERIES12: dict = {}
ORACLES12: dict = {}


# ---------------------------------------------------------------------------
# Q8 shape: national market share within one region, per year
# ---------------------------------------------------------------------------


def q_market_share(sf_dir: str, region: str = "AFRICA"):
    """Per (order year, supplier nation): that nation's share of ALL
    revenue billed to the region's customers — the TPC-H Q8 market-share
    rollup generalized to every supplier nation at once (no arbitrary
    nation pick; the share column sums to 1 per year).

    Plan: three co-partitioned bucketed exchanges chain the fact table to
    its dimensions (orderkey -> custkey -> suppkey); nation/region are
    constant-size dimensions carried as broadcast dicts inside the batch
    closures; (year, nation) revenue reduces as exact int64 cbp and the
    share is one transcribed division per row."""
    import ray.data as rd

    nat = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
    reg = _read(sf_dir, "region", ["r_regionkey", "r_name"]).to_pandas()
    region_keys = set(
        nat.merge(reg, left_on="n_regionkey", right_on="r_regionkey")
        .loc[lambda d: d["r_name"] == region, "n_nationkey"]
        .astype(int)
    )
    nation_name = dict(zip(nat["n_nationkey"].astype(int), nat["n_name"]))

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "suppkey": b["l_suppkey"].astype(np.int64),
                "cbp": _rev_cbp(b["l_extendedprice"], b["l_discount"]),
            }
        ),
        batch_format="pandas",
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "custkey": b["o_custkey"].astype(np.int64),
                "yr": b["o_orderdate"].dt.year.astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b.loc[
                    b["c_nationkey"].isin(region_keys), "c_custkey"
                ].astype(np.int64)
            }
        ).assign(in_region=np.int64(1)),
        batch_format="pandas",
    )
    supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "suppkey": b["s_suppkey"].astype(np.int64),
                "supp_nation": b["s_nationkey"].map(nation_name),
            }
        ),
        batch_format="pandas",
    )
    j1 = bucketed_join(li, orders, on=["orderkey"], how="inner")
    j2 = bucketed_join(j1, cust, on=["custkey"], how="inner")
    j3 = bucketed_join(j2, supp, on=["suppkey"], how="inner")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = (
            batch.groupby(["yr", "supp_nation"], sort=False)["cbp"]
            .sum()
            .reset_index(name="cbp")
        )
        return g.astype({"yr": np.int64, "cbp": np.int64})

    agg = hash_bucket_aggregate(
        j3.map_batches(partial, batch_format="pandas"),
        ["yr", "supp_nation"],
        [("cbp", "sum")],
    ).to_pandas()  # years x nations bounded
    tot = agg.groupby("yr")["cbp_sum"].transform("sum")
    return pd.DataFrame(
        {
            "yr": agg["yr"].astype(np.int64),
            "supp_nation": agg["supp_nation"].astype(str),
            "revenue": _r6away(
                agg["cbp_sum"].to_numpy(np.int64).astype(np.float64) / 1000000.0
            ),
            "share": _r6away(
                agg["cbp_sum"].to_numpy(np.int64).astype(np.float64)
                / tot.to_numpy(np.int64).astype(np.float64)
            ),
        }
    )


ORACLES12["market_share"] = """
WITH rev AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
         sn.n_name AS supp_nation,
         CAST(ROUND(l.l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l.l_discount * 10000) AS BIGINT)) AS cbp
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation cn ON c.c_nationkey = cn.n_nationkey
  JOIN region r ON cn.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation sn ON s.s_nationkey = sn.n_nationkey
  WHERE r.r_name = 'AFRICA'
),
a AS (
  SELECT yr, supp_nation, CAST(SUM(cbp) AS BIGINT) AS cbp
  FROM rev GROUP BY 1, 2
)
SELECT yr, supp_nation,
       ROUND(CAST(cbp AS DOUBLE) / 1000000.0, 6) AS revenue,
       ROUND(CAST(cbp AS DOUBLE)
             / CAST(CAST(SUM(cbp) OVER (PARTITION BY yr) AS BIGINT) AS DOUBLE),
             6) AS share
FROM a
"""


# ---------------------------------------------------------------------------
# Q16 shape: supplier diversity per part type
# ---------------------------------------------------------------------------


def q_supplier_diversity(sf_dir: str, excluded_brand: str = "Brand#23"):
    """Per part type (excluding one brand): how many DISTINCT suppliers
    have ever shipped it and how many distinct parts it spans — the
    Q16-shaped relationship count-distinct that measures sourcing
    redundancy. Both distincts reduce through exact key-deduplicating
    exchanges; no driver-side sets."""
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b["l_partkey"].astype(np.int64),
                "suppkey": b["l_suppkey"].astype(np.int64),
            }
        ).drop_duplicates(),
        batch_format="pandas",
    ).map_batches(lambda b: b.assign(one=np.int64(1)), batch_format="pandas")
    pairs = hash_bucket_aggregate(li, ["partkey", "suppkey"], [("one", "max")])
    part = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "partkey": b.loc[b["p_brand"] != excluded_brand, "p_partkey"].astype(
                    np.int64
                ),
                "p_type": b.loc[b["p_brand"] != excluded_brand, "p_type"],
            }
        ),
        batch_format="pandas",
    )
    typed = bucketed_join(pairs, part, on=["partkey"], how="inner")

    def mark(batch: pd.DataFrame) -> pd.DataFrame:
        return batch[["p_type", "suppkey", "partkey"]].assign(one=np.int64(1))

    marked = typed.map_batches(mark, batch_format="pandas").materialize()
    supp_distinct = hash_bucket_aggregate(
        marked, ["p_type", "suppkey"], [("one", "max")]
    )
    part_distinct = hash_bucket_aggregate(
        marked, ["p_type", "partkey"], [("one", "max")]
    )

    def count_per_type(ds, out_col):
        return (
            hash_bucket_aggregate(
                ds.map_batches(
                    lambda b: b.groupby("p_type", sort=False)
                    .size()
                    .reset_index(name=out_col)
                    .astype({out_col: np.int64}),
                    batch_format="pandas",
                ),
                ["p_type"],
                [(out_col, "sum")],
            )
            .to_pandas()
            .rename(columns={f"{out_col}_sum": out_col})
        )

    ns = count_per_type(supp_distinct, "n_supp")
    npart = count_per_type(part_distinct, "n_parts")
    out = ns.merge(npart, on="p_type")  # part-type bounded
    return pd.DataFrame(
        {
            "p_type": out["p_type"].astype(str),
            "n_supp": out["n_supp"].astype(np.int64),
            "n_parts": out["n_parts"].astype(np.int64),
        }
    )


ORACLES12["supplier_diversity"] = """
SELECT p_type,
       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
       CAST(COUNT(DISTINCT p_partkey) AS BIGINT) AS n_parts
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#23'
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Herfindahl-Hirschman concentration of hourly load
# ---------------------------------------------------------------------------


def q_load_concentration_hhi(sf_dir: str):
    """Per event type: the HHI of its load across present hours —
    sum of squared hour shares, computed as Q/S² over exact integer
    sum-of-squares and sum (one transcribed float expression). 1/n_hours
    = perfectly even load; 1.0 = everything in one hour."""
    agg = _hourly_counts(sf_dir)

    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        n = g["n_sum"].to_numpy(np.int64)
        q = int(np.sum(n * n))
        s = int(n.sum())
        rows.append(
            (t, int(n.size), _r6away(float(q) / (float(s) * float(s)))[()])
        )
    return pd.DataFrame(rows, columns=["event_type", "n_hours", "hhi"]).astype(
        {"n_hours": np.int64}
    )


ORACLES12["load_concentration_hhi"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT event_type, COUNT(*) AS n_hours,
         CAST(SUM(n * n) AS BIGINT) AS q, CAST(SUM(n) AS BIGINT) AS s
  FROM h GROUP BY 1
)
SELECT event_type, n_hours,
       ROUND(CAST(q AS DOUBLE) / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE)), 6) AS hhi
FROM a
"""


# ---------------------------------------------------------------------------
# Exact Gini coefficient of hourly load
# ---------------------------------------------------------------------------


def q_hourly_gini(sf_dir: str):
    """Per event type: the Gini coefficient of its hourly load over
    present hours — numerator sum((2i - n - 1)·v_(i)) computed entirely
    in int64 with a deterministic (count, hour) sort, divided once by
    n·S (gini_traffic scores hosts; this scores time)."""
    agg = _hourly_counts(sf_dir)
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        g = g.sort_values(["n_sum", "hour_us"])
        v = g["n_sum"].to_numpy(np.int64)
        n = v.size
        i = np.arange(1, n + 1, dtype=np.int64)
        num = int(np.sum((2 * i - n - 1) * v))
        s = int(v.sum())
        rows.append(
            (t, n, num, _r6away(float(num) / (float(n) * float(s)))[()])
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_hours", "gini_num", "gini"]
    ).astype({"n_hours": np.int64, "gini_num": np.int64})


ORACLES12["hourly_gini"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n, bh) AS i,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt,
         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS s
  FROM h
)
SELECT event_type,
       CAST(MAX(cnt) AS BIGINT) AS n_hours,
       CAST(SUM((2 * i - cnt - 1) * n) AS BIGINT) AS gini_num,
       ROUND(CAST(SUM((2 * i - cnt - 1) * n) AS DOUBLE)
             / (CAST(MAX(cnt) AS DOUBLE) * CAST(MAX(s) AS DOUBLE)), 6) AS gini
FROM r GROUP BY 1
"""


QUERIES12["market_share"] = q_market_share
QUERIES12["supplier_diversity"] = q_supplier_diversity
QUERIES12["load_concentration_hhi"] = q_load_concentration_hhi
QUERIES12["hourly_gini"] = q_hourly_gini
