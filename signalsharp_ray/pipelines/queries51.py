"""Round-3 batch 53: acquisition-era and fulfilment-shape diagnostics —
yearly customer acquisition (first-order year per customer with the
cumulative buyer base), the diurnal amplitude ratio per event type
(peak hour-of-day mean load over trough, with integer cross-multiplied
argmax/argmin so no float ordering exists), and the order lead-time
histogram in whole weeks (the fulfilment-shape view behind
priority_lead_time's means).

House parity: first-order years come from min-exchanges; hour-of-day
means compare as total_a * occ_b vs total_b * occ_a integer cross
products with (hod ASC) ties; lead weeks are integer day divisions.

Scale contracts: year and hod tables are bounded; per-order first-ship
mins reduce through one exchange; the histogram is weeks-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries16 import _read

QUERIES51: dict = {}
ORACLES51: dict = {}

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Yearly customer acquisition
# ---------------------------------------------------------------------------


def q_customer_acquisition_yearly(sf_dir: str):
    """Per year: customers placing their FIRST order that year and the
    cumulative buyer base — the commerce twin of user_acquisition.
    First-order dates reduce through one min-exchange; counts and the
    cumulative window are exact integers."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "date_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby("custkey", sort=False)["date_us"]
        .min()
        .reset_index(),
        batch_format="pandas",
    )
    first = hash_bucket_aggregate(orders, ["custkey"], [("date_us", "min")])
    per_year = (
        hash_bucket_aggregate(
            first.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "year": pd.DatetimeIndex(
                            b["date_us_min"].astype("datetime64[us]")
                        ).year.astype(np.int64),
                        "n": np.ones(len(b), dtype=np.int64),
                    }
                ),
                batch_format="pandas",
            ),
            ["year"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values("year")
    )
    cum = np.cumsum(per_year["n_sum"].to_numpy(np.int64))
    return pd.DataFrame(
        {
            "year": per_year["year"].to_numpy(np.int64),
            "new_customers": per_year["n_sum"].to_numpy(np.int64),
            "cumulative_customers": cum,
        }
    ).reset_index(drop=True)


ORACLES51["customer_acquisition_yearly"] = """
WITH f AS (
  SELECT o_custkey, MIN(o_orderdate) AS first_order FROM orders GROUP BY 1
),
y AS (
  SELECT CAST(year(first_order) AS BIGINT) AS year, COUNT(*) AS n
  FROM f GROUP BY 1
)
SELECT year,
       CAST(n AS BIGINT) AS new_customers,
       CAST(SUM(n) OVER (ORDER BY year) AS BIGINT) AS cumulative_customers
FROM y
"""


# ---------------------------------------------------------------------------
# Diurnal amplitude ratio per type
# ---------------------------------------------------------------------------


def q_diurnal_amplitude(sf_dir: str):
    """Per event type: the peak and trough hour-of-day (by mean load,
    integer cross-multiplied comparisons, (hod ASC) ties) and the
    peak/trough mean ratio — the swing a diurnal scaler must absorb.
    Types with a zero-count trough hour are excluded identically."""
    ev = _events(sf_dir, ["ts", "event_type"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
                "hod": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
                )
                % 24,
            }
        )
        .groupby(["event_type", "day_us", "hod"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    per = hash_bucket_aggregate(
        ev, ["event_type", "day_us", "hod"], [("n", "sum")]
    ).to_pandas()
    per["occ"] = 1
    slot = (
        per.groupby(["event_type", "hod"], sort=True)
        .agg(total=("n_sum", "sum"), occ=("occ", "sum"))
        .reset_index()
    )
    rows = []
    for t, g in slot.groupby("event_type", sort=True):
        if len(g) < 24:
            continue  # a silent hour-of-day -> trough undefined; skip
        best = worst = None
        for _, r in g.iterrows():
            tt, oo, hh = int(r["total"]), int(r["occ"]), int(r["hod"])
            if best is None or tt * best[1] > best[0] * oo or (
                tt * best[1] == best[0] * oo and hh < best[2]
            ):
                best = (tt, oo, hh)
            if worst is None or tt * worst[1] < worst[0] * oo or (
                tt * worst[1] == worst[0] * oo and hh < worst[2]
            ):
                worst = (tt, oo, hh)
        peak_mean = float(best[0]) / float(best[1])
        trough_mean = float(worst[0]) / float(worst[1])
        rows.append(
            (
                t,
                best[2],
                float(_r6away(peak_mean)),
                worst[2],
                float(_r6away(trough_mean)),
                float(_r6away(peak_mean / trough_mean)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "peak_hod", "peak_mean", "trough_hod",
                 "trough_mean", "amplitude_ratio"],
    ).astype({"peak_hod": np.int64, "trough_hod": np.int64})


ORACLES51["diurnal_amplitude"] = """
WITH c AS (
  SELECT event_type, date_trunc('day', ts) AS day,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
s AS (
  SELECT event_type, hod,
         CAST(SUM(n) AS BIGINT) AS total,
         COUNT(*) AS occ
  FROM c GROUP BY 1, 2
),
full24 AS (
  SELECT event_type FROM s GROUP BY 1 HAVING COUNT(*) = 24
),
r AS (
  SELECT s.event_type, s.hod, s.total, s.occ,
         ROW_NUMBER() OVER (PARTITION BY s.event_type
           ORDER BY CAST(s.total AS DOUBLE) / CAST(s.occ AS DOUBLE) DESC,
                    s.hod ASC) AS rmax,
         ROW_NUMBER() OVER (PARTITION BY s.event_type
           ORDER BY CAST(s.total AS DOUBLE) / CAST(s.occ AS DOUBLE) ASC,
                    s.hod ASC) AS rmin
  FROM s JOIN full24 USING (event_type)
)
SELECT p.event_type,
       CAST(p.hod AS BIGINT) AS peak_hod,
       ROUND(CAST(p.total AS DOUBLE) / CAST(p.occ AS DOUBLE), 6) AS peak_mean,
       CAST(q.hod AS BIGINT) AS trough_hod,
       ROUND(CAST(q.total AS DOUBLE) / CAST(q.occ AS DOUBLE), 6)
         AS trough_mean,
       ROUND((CAST(p.total AS DOUBLE) / CAST(p.occ AS DOUBLE))
             / (CAST(q.total AS DOUBLE) / CAST(q.occ AS DOUBLE)), 6)
         AS amplitude_ratio
FROM r p JOIN r q ON q.event_type = p.event_type AND p.rmax = 1 AND q.rmin = 1
"""


# ---------------------------------------------------------------------------
# Order lead-time histogram (whole weeks)
# ---------------------------------------------------------------------------


def q_lead_time_histogram(sf_dir: str):
    """How many orders first-ship in lead week w (floor of days/7 from
    order date to first shipment) — the fulfilment-shape histogram
    behind priority_lead_time's means. Exact integer day and week
    arithmetic through two exchanges."""
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["l_orderkey"].astype(np.int64),
                "ship_us": b["l_shipdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby("orderkey", sort=False)["ship_us"]
        .min()
        .reset_index(),
        batch_format="pandas",
    )
    first_ship = hash_bucket_aggregate(li, ["orderkey"], [("ship_us", "min")])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "date_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(orders, first_ship, on=["orderkey"], how="inner")
    hist = hash_bucket_aggregate(
        joined.map_batches(
            lambda b: pd.DataFrame(
                {
                    "lead_w": (
                        (b["ship_us_min"].astype(np.int64)
                         - b["date_us"].astype(np.int64))
                        // DAY_US
                    )
                    // 7,
                    "c": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["lead_w"],
        [("c", "sum")],
    ).to_pandas()
    return (
        pd.DataFrame(
            {
                "lead_weeks": hist["lead_w"].astype(np.int64),
                "n_orders": hist["c_sum"].astype(np.int64),
            }
        )
        .sort_values("lead_weeks")
        .reset_index(drop=True)
    )


ORACLES51["lead_time_histogram"] = """
WITH f AS (
  SELECT l_orderkey, MIN(l_shipdate) AS fs FROM lineitem GROUP BY 1
),
j AS (
  -- day diff is exact (midnight timestamps) so // is safe there; the
  -- week division can go NEGATIVE and DuckDB // truncates toward zero
  -- while Python floors -> shift positive before dividing
  SELECT (((epoch_us(f.fs) - epoch_us(o.o_orderdate)) // 86400000000
           + 700000) // 7) - 100000 AS lead_w
  FROM orders o JOIN f ON f.l_orderkey = o.o_orderkey
)
SELECT CAST(lead_w AS BIGINT) AS lead_weeks,
       CAST(COUNT(*) AS BIGINT) AS n_orders
FROM j GROUP BY 1
"""


QUERIES51["customer_acquisition_yearly"] = q_customer_acquisition_yearly
QUERIES51["diurnal_amplitude"] = q_diurnal_amplitude
QUERIES51["lead_time_histogram"] = q_lead_time_histogram
