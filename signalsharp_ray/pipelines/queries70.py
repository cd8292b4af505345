"""Round-3 batch 72: relational + webtext operators — the TPC-H-Q10
shape (top-20 customers by returned-item revenue, through the
lineitem -> orders -> customer -> nation chain), the pairwise Jaccard
similarity of source character-trigram SETS (the set-based complement
to trigram_uniqueness), and the quantity-band x discount-band revenue
matrix (the 2-D pricing heatmap).

House parity: revenue is the exact int64 cents x (10000 - basis-points)
sum (the tpch_q6_revenue unit, /1e6 on output); trigram presence
collapses to integer set sizes; every division is a single transcribed
float op. Top-20 ordering ties break on the exact integer revenue then
custkey ascending on both sides.

Scale contracts: the returned-lineitem aggregate pre-reduces per
l_orderkey inside map_batches, joins orders through the co-partitioned
bucketed_join (no fact broadcast), re-aggregates per custkey, and only
the top-20 rows (Dataset.sort + limit) reach the driver for the
bounded dimension lookup. The trigram grid is alphabet^3 x n_sources
bounded; the revenue matrix is a pure partial+final over ~66 cells.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES70: dict = {}
ORACLES70: dict = {}


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: top returned-item revenue customers
# ---------------------------------------------------------------------------


def q_returned_revenue_customers(sf_dir: str):
    """Top-20 customers by revenue lost to returns: sum of
    extendedprice*(1-discount) over returnflag='R' lineitems, joined
    through orders to customer and nation (reference shape: TPC-H Q10).
    Revenue sums are exact integer cents x bp; ordering is (revenue
    integer DESC, custkey ASC)."""
    import pyarrow.dataset as pads
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount",
                 "l_returnflag"],
        filter=pads.field("l_returnflag") == "R",
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(batch["l_extendedprice"])
        bp = np.rint(
            batch["l_discount"].to_numpy(np.float64) * 10000
        ).astype(np.int64)
        df = pd.DataFrame(
            {
                "l_orderkey": batch["l_orderkey"].astype(np.int64),
                "rcb": cents * (10000 - bp),
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )
        return (
            df.groupby("l_orderkey", sort=False).sum().reset_index()
        ).astype(np.int64)

    per_order = hash_bucket_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        ["l_orderkey"],
        [("rcb", "sum"), ("n", "sum")],
    )
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "l_orderkey": b["o_orderkey"].astype(np.int64),
                "o_custkey": b["o_custkey"].astype(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_order, orders, on=["l_orderkey"])

    def per_cust(batch: pd.DataFrame) -> pd.DataFrame:
        if len(batch) == 0 or "o_custkey" not in batch.columns:
            return pd.DataFrame(
                {"custkey": pd.Series(dtype=np.int64),
                 "rcb": pd.Series(dtype=np.int64),
                 "n": pd.Series(dtype=np.int64)}
            )
        b = batch.dropna(subset=["o_custkey", "rcb_sum"])
        df = pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "rcb": b["rcb_sum"].astype(np.int64),
                "n": b["n_sum"].astype(np.int64),
            }
        )
        return df.groupby("custkey", sort=False).sum().reset_index().astype(
            np.int64
        )

    top = (
        hash_bucket_aggregate(
            joined.map_batches(per_cust, batch_format="pandas"),
            ["custkey"],
            [("rcb", "sum"), ("n", "sum")],
        )
        .sort(["rcb_sum", "custkey"], descending=[True, False])
        .limit(20)
        .to_pandas()
    )
    cust = (
        _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
        .to_pandas()
        .set_index("c_custkey")
    )
    nation = (
        _read(sf_dir, "nation", ["n_nationkey", "n_name"])
        .to_pandas()
        .set_index("n_nationkey")["n_name"]
    )
    rows = []
    for _, r in top.iterrows():
        ck = int(r["custkey"])
        rows.append(
            (
                ck,
                str(cust.loc[ck, "c_name"]),
                str(nation.loc[int(cust.loc[ck, "c_nationkey"])]),
                int(r["n_sum"]),
                float(_r6away(float(int(r["rcb_sum"])) / 1000000.0)),
            )
        )
    return pd.DataFrame(
        rows, columns=["custkey", "c_name", "nation", "n_items", "revenue"]
    ).astype({"custkey": np.int64, "n_items": np.int64})


ORACLES70["returned_revenue_customers"] = """
WITH rl AS (
  SELECT l_orderkey,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT)
           * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)) AS rcb
  FROM lineitem WHERE l_returnflag = 'R'
),
a AS (
  SELECT o.o_custkey, CAST(SUM(rl.rcb) AS BIGINT) AS s, COUNT(*) AS n
  FROM rl JOIN orders o ON o.o_orderkey = rl.l_orderkey
  GROUP BY 1
)
SELECT c.c_custkey AS custkey, c.c_name, n.n_name AS nation,
       CAST(a.n AS BIGINT) AS n_items,
       ROUND(CAST(a.s AS DOUBLE) / 1000000.0, 6) AS revenue
FROM a
JOIN customer c ON c.c_custkey = a.o_custkey
JOIN nation n ON n.n_nationkey = c.c_nationkey
QUALIFY row_number() OVER (ORDER BY a.s DESC, c.c_custkey ASC) <= 20
"""


# ---------------------------------------------------------------------------
# Pairwise trigram-set Jaccard between sources
# ---------------------------------------------------------------------------


def q_trigram_set_jaccard(sf_dir: str):
    """Jaccard similarity of the distinct character-trigram sets of
    every source pair: |A inter B| / |A union B| over raw-text
    trigrams (spaces included, the char_trigram_profile alphabet).
    Presence collapses in one exchange; the pair math is exact
    integers and one division."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: set = set()
        for src, text in zip(batch["source"], batch["text"]):
            t = text or ""
            for i in range(len(t) - 2):
                rows.add((src, t[i:i + 3]))
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "tri": [k[1] for k in keys],
                "one": np.ones(len(keys), dtype=np.int64),
            }
        )

    pres = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "tri"],
        [("one", "max")],
    ).to_pandas()
    sizes = pres.groupby("source").size().astype(np.int64)
    sources = sorted(sizes.index.tolist())
    sets = {s: set(pres.loc[pres["source"] == s, "tri"]) for s in sources}
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = int(sizes.loc[a]) + int(sizes.loc[b]) - inter
            if union == 0:
                continue
            rows.append(
                (a, b, int(sizes.loc[a]), int(sizes.loc[b]), inter,
                 float(_r6away(float(inter) / float(union))))
            )
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_a", "n_b", "n_common", "jaccard"],
    ).astype({"n_a": np.int64, "n_b": np.int64, "n_common": np.int64})


ORACLES70["trigram_set_jaccard"] = """
WITH tri AS (
  SELECT DISTINCT source,
         UNNEST(list_transform(range(0, length(text) - 2),
                               i -> substr(text, CAST(i AS INT) + 1, 3))) AS tri
  FROM documents
),
sz AS (SELECT source, COUNT(*) AS n FROM tri GROUP BY 1),
inter AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS ni
  FROM tri a JOIN tri b ON b.tri = a.tri AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.sa AS source_a, i.sb AS source_b,
       CAST(za.n AS BIGINT) AS n_a, CAST(zb.n AS BIGINT) AS n_b,
       CAST(i.ni AS BIGINT) AS n_common,
       ROUND(CAST(i.ni AS DOUBLE) / CAST(za.n + zb.n - i.ni AS DOUBLE), 6)
         AS jaccard
FROM inter i
JOIN sz za ON za.source = i.sa
JOIN sz zb ON zb.source = i.sb
WHERE za.n + zb.n - i.ni > 0
"""


# ---------------------------------------------------------------------------
# Quantity-band x discount-band revenue matrix
# ---------------------------------------------------------------------------


def q_qty_discount_revenue_matrix(sf_dir: str):
    """Revenue and item counts per (quantity decade, discount percent)
    cell — the pricing heatmap behind discount_by_quantity. Bands are
    exact integers (rounded quantity // 10, basis-points // 100);
    revenue is the exact cents x bp sum."""
    li = _read(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice", "l_discount"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = np.rint(batch["l_quantity"].to_numpy(np.float64)).astype(np.int64)
        bp = np.rint(
            batch["l_discount"].to_numpy(np.float64) * 10000
        ).astype(np.int64)
        cents = _cents(batch["l_extendedprice"])
        df = pd.DataFrame(
            {
                "q_band": q // 10,
                "d_pct": bp // 100,
                "rcb": cents * (10000 - bp),
                "n": np.ones(len(batch), dtype=np.int64),
            }
        )
        return (
            df.groupby(["q_band", "d_pct"], sort=False).sum().reset_index()
        ).astype(np.int64)

    agg = hash_bucket_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        ["q_band", "d_pct"],
        [("rcb", "sum"), ("n", "sum")],
    ).to_pandas().sort_values(["q_band", "d_pct"])
    return pd.DataFrame(
        {
            "q_band": agg["q_band"].astype(np.int64),
            "d_pct": agg["d_pct"].astype(np.int64),
            "n_items": agg["n_sum"].astype(np.int64),
            "revenue": _r6away(
                agg["rcb_sum"].to_numpy(np.float64) / 1000000.0
            ),
        }
    ).reset_index(drop=True)


ORACLES70["qty_discount_revenue_matrix"] = """
SELECT CAST(ROUND(l_quantity) AS BIGINT) // 10 AS q_band,
       CAST(ROUND(l_discount * 10000) AS BIGINT) // 100 AS d_pct,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                   * (10000 - CAST(ROUND(l_discount * 10000) AS BIGINT)))
              AS BIGINT) AS DOUBLE) / 1000000.0, 6) AS revenue
FROM lineitem
GROUP BY 1, 2
"""


QUERIES70["returned_revenue_customers"] = q_returned_revenue_customers
QUERIES70["trigram_set_jaccard"] = q_trigram_set_jaccard
QUERIES70["qty_discount_revenue_matrix"] = q_qty_discount_revenue_matrix
