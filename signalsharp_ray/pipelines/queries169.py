"""Round-5 batch 169: price-index economics over the order history —
Laspeyres, Paasche and Fisher indexes of realized (post-discount) unit
prices between the FIRST and LAST ship year, over the parts traded in
both. The canonical basket-weighted answer to "did effective prices
rise?" that a plain average of prices gets wrong when the mix shifts.

House parity strategy: per-(part, year) realized revenue and quantity
accumulate as exact integers (cents x (100 - discount basis points),
integral quantities); each part's unit price is ONE shared float
division, and the index numerators/denominators fold ascending by
partkey (list_sum over ORDER BY l_partkey) so both engines associate
identically; Fisher is sqrt(L*P) via libm.

Scale contracts: the (part, year) aggregation is one bucketed exchange
over the fact table; the basket fold runs over the part dimension
(bounded, the house broadcast-dimension contract)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .queries2 import _r6

QUERIES169: dict = {}
ORACLES169: dict = {}


def q_price_index_fisher(sf_dir: str):
    """Laspeyres / Paasche / Fisher realized-price indexes between the
    first and last ship year over common parts. Output (year0, year1,
    n_common_parts, laspeyres, paasche, fisher)."""
    import ray.data as rd

    from ..common.raytools import hash_bucket_aggregate

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_shipdate", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        year = (
            batch["l_shipdate"].to_numpy("datetime64[us]")
            .astype("datetime64[Y]").view(np.int64) + 1970
        )
        ep = batch["l_extendedprice"].to_numpy(np.float64) * 100.0
        cents = (np.sign(ep) * np.floor(np.abs(ep) + 0.5)).astype(np.int64)
        disc = np.rint(
            (1.0 - batch["l_discount"].to_numpy(np.float64)) * 100
        ).astype(np.int64)
        qty = np.rint(batch["l_quantity"].to_numpy(np.float64)).astype(
            np.int64
        )
        return pd.DataFrame(
            {
                "partkey": batch["l_partkey"].astype(np.int64),
                "year": year.astype(np.int64),
                "rev": cents * disc,  # exact: cents x (100 - bp)
                "qty": qty,
            }
        )

    agg = (
        hash_bucket_aggregate(
            li.map_batches(partial, batch_format="pandas"),
            ["partkey", "year"],
            [("rev", "sum"), ("qty", "sum")],
        )
        .to_pandas()
    )
    y0 = int(agg["year"].min())
    y1 = int(agg["year"].max())
    a0 = agg[agg["year"] == y0].set_index("partkey")
    a1 = agg[agg["year"] == y1].set_index("partkey")
    common = sorted(set(a0.index) & set(a1.index))
    l_num = l_den = p_num = p_den = 0.0
    for pk in common:  # ascending-partkey folds
        p0 = float(int(a0.loc[pk, "rev_sum"])) / float(
            int(a0.loc[pk, "qty_sum"])
        )
        p1 = float(int(a1.loc[pk, "rev_sum"])) / float(
            int(a1.loc[pk, "qty_sum"])
        )
        q0 = float(int(a0.loc[pk, "qty_sum"]))
        q1 = float(int(a1.loc[pk, "qty_sum"]))
        l_num += p1 * q0
        l_den += p0 * q0
        p_num += p1 * q1
        p_den += p0 * q1
    lasp = l_num / l_den
    paas = p_num / p_den
    return pd.DataFrame(
        {
            "year0": np.array([y0], dtype=np.int64),
            "year1": np.array([y1], dtype=np.int64),
            "n_common_parts": np.array([len(common)], dtype=np.int64),
            "laspeyres": _r6(np.array([lasp])),
            "paasche": _r6(np.array([paas])),
            "fisher": _r6(np.array([math.sqrt(lasp * paas)])),
        }
    )


QUERIES169["price_index_fisher"] = q_price_index_fisher
ORACLES169["price_index_fisher"] = """
WITH py AS (
  SELECT l_partkey AS partkey, year(l_shipdate) AS y,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)
                  * CAST(ROUND((1.0 - l_discount) * 100) AS BIGINT))
              AS BIGINT) AS rev,
         CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
  FROM lineitem GROUP BY 1, 2
),
yy AS (SELECT MIN(y) AS y0, MAX(y) AS y1 FROM py),
c AS (
  SELECT a.partkey,
         CAST(a.rev AS DOUBLE) / CAST(a.qty AS DOUBLE) AS p0,
         CAST(b.rev AS DOUBLE) / CAST(b.qty AS DOUBLE) AS p1,
         CAST(a.qty AS DOUBLE) AS q0,
         CAST(b.qty AS DOUBLE) AS q1
  FROM py a JOIN py b USING (partkey), yy
  WHERE a.y = yy.y0 AND b.y = yy.y1
),
f AS (
  SELECT COUNT(*) AS n,
         list_sum(list(p1 * q0 ORDER BY partkey)) AS l_num,
         list_sum(list(p0 * q0 ORDER BY partkey)) AS l_den,
         list_sum(list(p1 * q1 ORDER BY partkey)) AS p_num,
         list_sum(list(p0 * q1 ORDER BY partkey)) AS p_den
  FROM c
)
SELECT yy.y0 AS year0, yy.y1 AS year1,
       CAST(f.n AS BIGINT) AS n_common_parts,
       ROUND(f.l_num / f.l_den, 6) AS laspeyres,
       ROUND(f.p_num / f.p_den, 6) AS paasche,
       ROUND(sqrt((f.l_num / f.l_den) * (f.p_num / f.p_den)), 6) AS fisher
FROM f, yy
"""
