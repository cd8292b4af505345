"""Round-3 batch 112: data-resolution and peak operators — the
timestamp-resolution audit (do event timestamps carry genuine
sub-second/sub-millisecond precision, or were they bucketed upstream),
the calendar day carrying each type's largest value sum, and the
median / p90 of orders per customer.

House parity: resolution predicates are exact integer modulos; peak
days select (centivalue sum DESC, day ASC) on exact integers;
quantiles run over small-integer order counts.

Scale contracts: three bounded partial+final aggregates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES110: dict = {}
ORACLES110: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Timestamp resolution audit
# ---------------------------------------------------------------------------


def q_ts_resolution_audit(sf_dir: str):
    """One global row: share of event timestamps with nonzero
    sub-second microseconds and nonzero sub-millisecond microseconds —
    full-resolution clocks vs upstream bucketing."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: (
            lambda us: pd.DataFrame(
                {
                    "n": np.array([len(us)], dtype=np.int64),
                    "subsec": np.array(
                        [int((us % 1000000 != 0).sum())], dtype=np.int64
                    ),
                    "submilli": np.array(
                        [int((us % 1000 != 0).sum())], dtype=np.int64
                    ),
                }
            )
        )(b["ts"].astype("datetime64[us]").astype("int64").to_numpy()),
        batch_format="pandas",
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"n_events": pd.Series(dtype=np.int64),
         "subsecond_share": pd.Series(dtype=np.float64),
         "submilli_share": pd.Series(dtype=np.float64)}
    )
    n = int(ev["n"].sum()) if len(ev) else 0
    if n == 0:
        return out_empty
    return pd.DataFrame(
        {
            "n_events": np.array([n], dtype=np.int64),
            "subsecond_share": [
                float(_r6away(float(int(ev["subsec"].sum())) / float(n)))
            ],
            "submilli_share": [
                float(_r6away(float(int(ev["submilli"].sum())) / float(n)))
            ],
        }
    )


ORACLES110["ts_resolution_audit"] = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_events,
       ROUND(CAST(COUNT(*) FILTER (WHERE epoch_us(ts) % 1000000 != 0)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS subsecond_share,
       ROUND(CAST(COUNT(*) FILTER (WHERE epoch_us(ts) % 1000 != 0)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         AS submilli_share
FROM events
"""


# ---------------------------------------------------------------------------
# Peak value day per type
# ---------------------------------------------------------------------------


def q_peak_value_day_by_type(sf_dir: str):
    """Per event_type: the calendar day with the largest centivalue sum
    (sum DESC, day ASC) and its share of the type's total value."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64")
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "day": (us // DAY_US).astype(np.int64),
                    "s": _cents(batch["value"]),
                }
            )
            .groupby(["event_type", "day"], sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "day"],
        [("s", "sum")],
    ).to_pandas()
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        tot = int(g["s_sum"].sum())
        if tot == 0:
            continue
        g = g.sort_values(["s_sum", "day"], ascending=[False, True])
        day = int(g["day"].iloc[0])
        top = int(g["s_sum"].iloc[0])
        rows.append(
            (
                et,
                np.datetime64(day * DAY_US, "us").astype("datetime64[us]"),
                float(_r6away(float(top) / 100.0)),
                float(_r6away(float(top) / float(tot))),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "peak_day", "peak_value", "peak_share"],
    )


ORACLES110["peak_value_day_by_type"] = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1, 2
),
t AS (SELECT event_type, CAST(SUM(s) AS BIGINT) AS tot FROM d GROUP BY 1),
pk AS (
  SELECT event_type, day, s FROM d
  QUALIFY row_number() OVER (PARTITION BY event_type
                             ORDER BY s DESC, day ASC) = 1
)
SELECT pk.event_type, pk.day AS peak_day,
       ROUND(CAST(pk.s AS DOUBLE) / 100.0, 6) AS peak_value,
       ROUND(CAST(pk.s AS DOUBLE) / CAST(t.tot AS DOUBLE), 6) AS peak_share
FROM pk JOIN t USING (event_type)
WHERE t.tot != 0
"""


# ---------------------------------------------------------------------------
# Orders-per-customer quantiles
# ---------------------------------------------------------------------------


def q_orders_per_customer_quantiles(sf_dir: str):
    """One global row: p50 and p90 of orders per customer (customers
    with >= 1 order)."""
    per_cust = (
        hash_bucket_aggregate(
            _read(sf_dir, "orders", ["o_custkey"]).map_batches(
                lambda b: pd.DataFrame(
                    {
                        "custkey": b["o_custkey"].astype(np.int64),
                        "n": np.ones(len(b), dtype=np.int64),
                    }
                )
                .groupby("custkey", sort=False)
                .sum()
                .reset_index(),
                batch_format="pandas",
            ),
            ["custkey"],
            [("n", "sum")],
        )
        .to_pandas()
    )
    out_empty = pd.DataFrame(
        {"n_customers": pd.Series(dtype=np.int64),
         "p50_orders": pd.Series(dtype=np.float64),
         "p90_orders": pd.Series(dtype=np.float64)}
    )
    k = len(per_cust)
    if k == 0:
        return out_empty
    c = per_cust["n_sum"].to_numpy(np.float64)
    return pd.DataFrame(
        {
            "n_customers": np.array([k], dtype=np.int64),
            "p50_orders": [float(_r6away(float(np.quantile(c, 0.5))))],
            "p90_orders": [float(_r6away(float(np.quantile(c, 0.9))))],
        }
    )


ORACLES110["orders_per_customer_quantiles"] = """
WITH pc AS (SELECT o_custkey, COUNT(*) AS n FROM orders GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
       ROUND(quantile_cont(CAST(n AS DOUBLE), 0.5), 6) AS p50_orders,
       ROUND(quantile_cont(CAST(n AS DOUBLE), 0.9), 6) AS p90_orders
FROM pc
"""


QUERIES110["ts_resolution_audit"] = q_ts_resolution_audit
QUERIES110["peak_value_day_by_type"] = q_peak_value_day_by_type
QUERIES110["orders_per_customer_quantiles"] = q_orders_per_customer_quantiles
