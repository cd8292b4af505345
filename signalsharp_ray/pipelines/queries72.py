"""Round-3 batch 74: semi-structured and dimension-profile operators —
the distribution of the JSON props field `k` in decade bands per
event_type (the semi-structured histogram next to json_field_rollup),
per-market-segment customer balance statistics, and the global
tax-vs-discount correlation over lineitems (are higher discounts taxed
differently).

House parity: the k extraction is the json_field_rollup C-regex; bands
and counts are exact integers; balances are exact cents; the Pearson r
is one transcribed float expression over exact int64 basis-point
sums.

Scale contracts: all three are pure partial+final aggregates through
one bucketed exchange with bounded output (bands x types, segments,
one row).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES72: dict = {}
ORACLES72: dict = {}


# ---------------------------------------------------------------------------
# props.k decade-band distribution
# ---------------------------------------------------------------------------


def q_props_k_bands(sf_dir: str):
    """Per (event_type, k // 10): event count and within-type share of
    the JSON props integer field k. Malformed/missing k rows drop on
    both sides."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        k = (
            batch["props"]
            .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
            .astype("float64")
        )
        df = pd.DataFrame({"event_type": batch["event_type"], "k": k}).dropna()
        df["band"] = (df["k"].astype(np.int64) // 10).astype(np.int64)
        df["n"] = np.ones(len(df), dtype=np.int64)
        g = (
            df.groupby(["event_type", "band"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        return g

    agg = hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "props"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "band"],
        [("n", "sum")],
    ).to_pandas().sort_values(["event_type", "band"])
    tot = agg.groupby("event_type")["n_sum"].transform("sum").astype(np.int64)
    return pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "band": agg["band"].astype(np.int64),
            "n_events": agg["n_sum"].astype(np.int64),
            "share": _r6away(
                agg["n_sum"].to_numpy(np.float64) / tot.to_numpy(np.float64)
            ),
        }
    ).reset_index(drop=True)


ORACLES72["props_k_bands"] = """
WITH k AS (
  SELECT event_type,
         CAST(regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) AS BIGINT) AS kv
  FROM events
  WHERE regexp_extract(props, '"k"\\s*:\\s*(-?\\d+)', 1) != ''
),
b AS (
  SELECT event_type, kv // 10 AS band, COUNT(*) AS n
  FROM k GROUP BY 1, 2
),
t AS (SELECT event_type, SUM(n) AS tot FROM b GROUP BY 1)
SELECT b.event_type, CAST(b.band AS BIGINT) AS band,
       CAST(b.n AS BIGINT) AS n_events,
       ROUND(CAST(b.n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
FROM b JOIN t USING (event_type)
"""


# ---------------------------------------------------------------------------
# Market-segment balance statistics
# ---------------------------------------------------------------------------


def q_mktsegment_balance_stats(sf_dir: str):
    """Per c_mktsegment: customer count, mean account balance, and the
    share of customers in the red (negative balance). Balances are
    exact cents; two transcribed divisions."""
    cust = _read(sf_dir, "customer", ["c_mktsegment", "c_acctbal"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        cents = _cents(batch["c_acctbal"])
        df = pd.DataFrame(
            {
                "segment": batch["c_mktsegment"],
                "cents": cents,
                "n": np.ones(len(batch), dtype=np.int64),
                "neg": (cents < 0).astype(np.int64),
            }
        )
        return (
            df.groupby("segment", sort=False).sum().reset_index()
        )

    agg = hash_bucket_aggregate(
        cust.map_batches(partial, batch_format="pandas"),
        ["segment"],
        [("cents", "sum"), ("n", "sum"), ("neg", "sum")],
    ).to_pandas().sort_values("segment")
    return pd.DataFrame(
        {
            "segment": agg["segment"].astype(str),
            "n_customers": agg["n_sum"].astype(np.int64),
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


ORACLES72["mktsegment_balance_stats"] = """
WITH c AS (
  SELECT c_mktsegment AS segment,
         CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents
  FROM customer
),
a AS (
  SELECT segment, COUNT(*) AS n, SUM(cents) AS s,
         COUNT(*) FILTER (WHERE cents < 0) AS neg
  FROM c GROUP BY 1
)
SELECT segment, CAST(n AS BIGINT) AS n_customers,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6)
         AS mean_balance,
       ROUND(CAST(neg AS DOUBLE) / CAST(n AS DOUBLE), 6) AS negative_share
FROM a
"""


# ---------------------------------------------------------------------------
# Tax vs discount correlation
# ---------------------------------------------------------------------------


def q_tax_discount_corr(sf_dir: str):
    """Global Pearson correlation between the lineitem tax and discount
    rates (both as exact basis-point integers): one row with n and r.
    All sums are int64; r is one transcribed float expression."""
    li = _read(sf_dir, "lineitem", ["l_tax", "l_discount"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        t = np.rint(batch["l_tax"].to_numpy(np.float64) * 10000).astype(
            np.int64
        )
        d = np.rint(batch["l_discount"].to_numpy(np.float64) * 10000).astype(
            np.int64
        )
        return pd.DataFrame(
            {
                "n": np.array([len(t)], dtype=np.int64),
                "st": np.array([int(t.sum())], dtype=np.int64),
                "sd": np.array([int(d.sum())], dtype=np.int64),
                "stt": np.array([int((t * t).sum())], dtype=np.int64),
                "sdd": np.array([int((d * d).sum())], dtype=np.int64),
                "std": np.array([int((t * d).sum())], dtype=np.int64),
            }
        )

    parts = li.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    out_empty = pd.DataFrame(
        {"n_items": pd.Series(dtype=np.int64),
         "r": pd.Series(dtype=np.float64)}
    )
    if n < 2:
        return out_empty
    st = int(parts["st"].sum())
    sd = int(parts["sd"].sum())
    stt = int(parts["stt"].sum())
    sdd = int(parts["sdd"].sum())
    std = int(parts["std"].sum())
    dt = float(n * stt - st * st)
    dd = float(n * sdd - sd * sd)
    if dt <= 0.0 or dd <= 0.0:
        return out_empty
    r = float(n * std - st * sd) / (math.sqrt(dt) * math.sqrt(dd))
    return pd.DataFrame(
        {
            "n_items": np.array([n], dtype=np.int64),
            "r": [float(_r6away(r))],
        }
    )


ORACLES72["tax_discount_corr"] = """
WITH b AS (
  SELECT CAST(ROUND(l_tax * 10000) AS BIGINT) AS t,
         CAST(ROUND(l_discount * 10000) AS BIGINT) AS d
  FROM lineitem
),
s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(t) AS BIGINT) AS st, CAST(SUM(d) AS BIGINT) AS sd,
         CAST(SUM(t*t) AS BIGINT) AS stt, CAST(SUM(d*d) AS BIGINT) AS sdd,
         CAST(SUM(t*d) AS BIGINT) AS std
  FROM b
)
SELECT CAST(n AS BIGINT) AS n_items,
       ROUND(CAST(CAST(n AS HUGEINT) * std - CAST(st AS HUGEINT) * sd
                  AS DOUBLE)
             / (sqrt(CAST(CAST(n AS HUGEINT) * stt
                          - CAST(st AS HUGEINT) * st AS DOUBLE))
                * sqrt(CAST(CAST(n AS HUGEINT) * sdd
                            - CAST(sd AS HUGEINT) * sd AS DOUBLE))), 6) AS r
FROM s
WHERE n >= 2 AND CAST(n AS HUGEINT) * stt - CAST(st AS HUGEINT) * st > 0
  AND CAST(n AS HUGEINT) * sdd - CAST(sd AS HUGEINT) * sd > 0
"""


QUERIES72["props_k_bands"] = q_props_k_bands
QUERIES72["mktsegment_balance_stats"] = q_mktsegment_balance_stats
QUERIES72["tax_discount_corr"] = q_tax_discount_corr
