"""Round-3 batch 111: operational-calendar and catalog-shape
operators — the shipment day-of-week mix (warehouse cadence, distinct
from the order-placement mix), the mean event value per (type,
day-of-week) cell, and the retail-price band histogram of the part
catalog.

House parity: all counts/cents exact; dow is the house (epoch day + 3)
% 7; price bands are exact cents // 10000 ($100 bands).

Scale contracts: three bounded partial+final aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES109: dict = {}
ORACLES109: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Shipment day-of-week mix
# ---------------------------------------------------------------------------


def q_ship_dow_mix(sf_dir: str):
    """Per day-of-week (0=Mon): shipment count and share — the
    warehouse operating rhythm."""
    li = _read(sf_dir, "lineitem", ["l_shipdate"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["l_shipdate"].astype("datetime64[us]").astype("int64")
        return (
            pd.DataFrame(
                {
                    "dow": (((us // DAY_US) + 3) % 7).astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                }
            )
            .groupby("dow", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            li.map_batches(partial, batch_format="pandas"),
            ["dow"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values("dow")
    )
    tot = int(agg["n_sum"].sum())
    return pd.DataFrame(
        {
            "dow": agg["dow"].astype(np.int64),
            "n_shipments": agg["n_sum"].astype(np.int64),
            "share": _r6away(agg["n_sum"].to_numpy(np.float64) / float(tot)),
        }
    ).reset_index(drop=True)


ORACLES109["ship_dow_mix"] = """
WITH c AS (
  SELECT (epoch_us(l_shipdate) // 86400000000 + 3) % 7 AS dow,
         COUNT(*) AS n
  FROM lineitem GROUP BY 1
),
t AS (SELECT SUM(n) AS tot FROM c)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(n AS BIGINT) AS n_shipments,
       ROUND(CAST(n AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS share
FROM c, t
"""


# ---------------------------------------------------------------------------
# Type x day-of-week mean value matrix
# ---------------------------------------------------------------------------


def q_type_dow_value_matrix(sf_dir: str):
    """Per (event_type, dow): event count and mean value — the
    calendar-behaviour money matrix."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "dow": (((us // DAY_US) + 3) % 7).astype(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                    "s": _cents(batch["value"]),
                }
            )
            .groupby(["event_type", "dow"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type", "dow"],
            [("n", "sum"), ("s", "sum")],
        )
        .to_pandas()
        .sort_values(["event_type", "dow"])
    )
    return pd.DataFrame(
        {
            "event_type": agg["event_type"].astype(str),
            "dow": agg["dow"].astype(np.int64),
            "n_events": agg["n_sum"].astype(np.int64),
            "mean_value": _r6away(
                agg["s_sum"].to_numpy(np.float64)
                / agg["n_sum"].to_numpy(np.float64)
                / 100.0
            ),
        }
    ).reset_index(drop=True)


ORACLES109["type_dow_value_matrix"] = """
SELECT event_type,
       CAST((epoch_us(ts) // 86400000000 + 3) % 7 AS BIGINT) AS dow,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS mean_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Retail price band histogram
# ---------------------------------------------------------------------------


def q_retail_price_band_histogram(sf_dir: str):
    """Per $100 retail-price band: part count — the catalog's price
    laddering."""
    part = _read(sf_dir, "part", ["p_retailprice"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = _cents(batch["p_retailprice"])
        return (
            pd.DataFrame(
                {
                    "band": (c // 10000).astype(np.int64),
                    "n": np.ones(len(c), dtype=np.int64),
                }
            )
            .groupby("band", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            part.map_batches(partial, batch_format="pandas"),
            ["band"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values("band")
    )
    return pd.DataFrame(
        {
            "price_band": agg["band"].astype(np.int64),
            "n_parts": agg["n_sum"].astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES109["retail_price_band_histogram"] = """
SELECT CAST(CAST(ROUND(p_retailprice * 100) AS BIGINT) // 10000 AS BIGINT)
         AS price_band,
       CAST(COUNT(*) AS BIGINT) AS n_parts
FROM part GROUP BY 1
"""


QUERIES109["ship_dow_mix"] = q_ship_dow_mix
QUERIES109["type_dow_value_matrix"] = q_type_dow_value_matrix
QUERIES109["retail_price_band_histogram"] = q_retail_price_band_histogram
