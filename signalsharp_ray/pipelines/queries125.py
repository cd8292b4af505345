"""Round-4 batch 125: lifecycle analytics — the Kaplan-Meier survival
curve of user lifetimes with right-censoring at the observation edge
(the churn analysis every retention team runs), the interpurchase-time
histogram (reorder-cycle distribution over customer order gaps), and
discount price elasticity (mean quantity per discrete discount level
plus the OLS slope — does discounting actually move volume).

House parity: lifetimes, risk sets, death counts and gap-day histograms
are exact integers; the KM product folds as exp(sum ln(1 - d/n)) over
ascending death times with math.log/math.exp == DuckDB ln/exp (the
acf_decay_time libm contract), one correlated ascending list_sum per
emitted row on the SQL side; elasticity's per-level means are single
shared divisions and the slope folds x-ascending.

Scale contracts: per-user min/max and per-level quantity sums reduce
through bucketed exchanges; the window end is ONE scalar aggregate; the
KM/elasticity driver folds run over day-span / discount-level bounded
tables; order gaps use the per-series bucketed_map_groups contract and
exchange only (gap_days, count) rows."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries14 import _fold

QUERIES125: dict = {}
ORACLES125: dict = {}

DAY_US = 86_400_000_000
KM_CENSOR_DAYS = 3  # last event within the final 3 window days = censored


# ---------------------------------------------------------------------------
# Kaplan-Meier survival of user lifetimes
# ---------------------------------------------------------------------------


def q_kaplan_meier(sf_dir: str):
    """Kaplan-Meier estimator over user lifetimes (days between first
    and last event). Users whose last event falls in the final 3 days of
    the observation window are right-censored (they may still be alive);
    both censored and uncensored users count in the risk set at their
    lifetime. Emits one row per death time with the risk set size, death
    count and the survival estimate S(t) = exp(sum ln(1 - d_i/n_i)) over
    ascending death times."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
        )
        return (
            pd.DataFrame(
                {
                    "user_id": batch["user_id"].to_numpy(np.int64),
                    "f": day,
                    "l": day,
                }
            )
            .groupby("user_id", sort=False)
            .agg(f=("f", "min"), l=("l", "max"))
            .reset_index()
        )

    users = hash_bucket_aggregate(
        _events(sf_dir, ["user_id", "ts"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["user_id"],
        [("f", "min"), ("l", "max")],
    )
    end_day = int(users.max("l_max"))

    def lifetimes(batch: pd.DataFrame) -> pd.DataFrame:
        lt = (batch["l_max"] - batch["f_min"]).to_numpy(np.int64)
        cens = (
            batch["l_max"].to_numpy(np.int64) >= end_day - (KM_CENSOR_DAYS - 1)
        ).astype(np.int64)
        return (
            pd.DataFrame(
                {"t": lt, "cens": cens, "n": np.ones(len(batch), dtype=np.int64)}
            )
            .groupby(["t", "cens"], sort=False)
            .sum()
            .reset_index()
        )

    counts = (
        hash_bucket_aggregate(
            users.map_batches(lifetimes, batch_format="pandas"),
            ["t", "cens"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["t", "cens"])
    )
    ts = sorted(counts["t"].unique())
    total_at = {
        int(t): int(counts[counts["t"] == t]["n_sum"].sum()) for t in ts
    }
    deaths_at = {
        int(t): int(
            counts[(counts["t"] == t) & (counts["cens"] == 0)]["n_sum"].sum()
        )
        for t in ts
    }
    total_users = sum(total_at.values())
    rows = []
    lnsum = 0.0
    removed = 0
    for t in ts:
        n_risk = total_users - removed
        d = deaths_at[int(t)]
        if d > 0:
            lnsum = lnsum + math.log(
                1.0 - float(d) / float(n_risk)
            )
            rows.append(
                (int(t), n_risk, d, float(_r6away(math.exp(lnsum))))
            )
        removed += total_at[int(t)]
    return pd.DataFrame(
        rows, columns=["t_days", "n_risk", "n_deaths", "survival"]
    ).astype({"t_days": np.int64, "n_risk": np.int64, "n_deaths": np.int64})


ORACLES125["kaplan_meier"] = f"""
WITH u AS (
  SELECT user_id,
         MIN(epoch_us(ts) // 86400000000) AS f,
         MAX(epoch_us(ts) // 86400000000) AS l
  FROM events GROUP BY 1
),
p AS (SELECT MAX(l) AS end_day FROM u),
lt AS (
  SELECT l - f AS t,
         CASE WHEN l >= p.end_day - {KM_CENSOR_DAYS - 1} THEN 1 ELSE 0 END
           AS cens
  FROM u CROSS JOIN p
),
d AS (
  SELECT t, COUNT(*) FILTER (WHERE cens = 0) AS deaths
  FROM lt GROUP BY 1
),
risk AS (
  SELECT d.t, d.deaths,
         (SELECT COUNT(*) FROM lt WHERE lt.t >= d.t) AS n_risk
  FROM d WHERE d.deaths > 0
)
SELECT r.t AS t_days, CAST(r.n_risk AS BIGINT) AS n_risk,
       CAST(r.deaths AS BIGINT) AS n_deaths,
       ROUND(exp((SELECT list_sum(list(
                    ln(CAST(1.0 AS DOUBLE)
                       - CAST(r2.deaths AS DOUBLE)
                         / CAST(r2.n_risk AS DOUBLE))
                    ORDER BY r2.t))
                  FROM risk r2 WHERE r2.t <= r.t)), 6) AS survival
FROM risk r
"""


# ---------------------------------------------------------------------------
# Interpurchase-time histogram
# ---------------------------------------------------------------------------


def q_interpurchase_time(sf_dir: str):
    """Histogram of gaps (calendar days) between a customer's
    consecutive orders — the reorder-cycle distribution demand planners
    read (a spike at 7 means weekly shoppers). Orders sort
    (o_orderdate, o_orderkey) per customer; gap days are exact integers
    and the histogram is one bounded exchange."""
    import ray.data as rd

    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_orderdate"],
    )

    def gaps(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["o_orderdate", "o_orderkey"])
        day = (
            df["o_orderdate"].to_numpy("datetime64[us]").view(np.int64)
            // DAY_US
        )
        if len(day) < 2:
            return pd.DataFrame(
                {"gap_days": pd.Series([], dtype=np.int64)}
            )
        return pd.DataFrame({"gap_days": (day[1:] - day[:-1])})

    pergap = bucketed_map_groups(orders, ["o_custkey"], gaps)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "gap_days": batch["gap_days"].to_numpy(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby("gap_days", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        pergap.map_batches(partial, batch_format="pandas"),
        ["gap_days"],
        [("n", "sum")],
    ).to_pandas()
    return pd.DataFrame(
        {
            "gap_days": agg["gap_days"].to_numpy(np.int64),
            "n_gaps": agg["n_sum"].to_numpy(np.int64),
        }
    )


ORACLES125["interpurchase_time"] = """
WITH s AS (
  SELECT o_custkey,
         epoch_us(o_orderdate) // 86400000000 AS day,
         LAG(epoch_us(o_orderdate) // 86400000000)
           OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey) AS prev
  FROM orders
)
SELECT day - prev AS gap_days, CAST(COUNT(*) AS BIGINT) AS n_gaps
FROM s WHERE prev IS NOT NULL
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Discount price elasticity
# ---------------------------------------------------------------------------


def q_price_elasticity(sf_dir: str):
    """Per discrete discount level (cents): lineitem count and mean
    quantity, plus the OLS slope of mean quantity on discount cents
    across levels — the does-discounting-move-volume table. Quantity
    sums are exact centiquantity integers; each mean is one shared
    division; the slope folds over ascending discount level."""
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_discount", "l_quantity"]
    )

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        d = batch["l_discount"].to_numpy(np.float64)
        dc = (np.sign(d * 100) * np.floor(np.abs(d * 100) + 0.5)).astype(
            np.int64
        )
        q = batch["l_quantity"].to_numpy(np.float64)
        qc = (np.sign(q * 100) * np.floor(np.abs(q * 100) + 0.5)).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "disc_cents": dc,
                    "n": np.ones(len(batch), dtype=np.int64),
                    "qc": qc,
                }
            )
            .groupby("disc_cents", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            li.map_batches(partial, batch_format="pandas"),
            ["disc_cents"],
            [("n", "sum"), ("qc", "sum")],
        )
        .to_pandas()
        .sort_values("disc_cents")
    )
    xs = agg["disc_cents"].to_numpy(np.int64)
    ns = agg["n_sum"].to_numpy(np.int64)
    qcs = agg["qc_sum"].to_numpy(np.int64)
    ys = [float(q) / 100.0 / float(n) for q, n in zip(qcs, ns)]
    k = len(xs)
    sx = int(xs.sum())
    sxx = int((xs * xs).sum())
    sy = _fold(ys)
    sxy = _fold([float(x) * y for x, y in zip(xs, ys)])
    denom = k * sxx - sx * sx
    slope = (
        (float(k) * sxy - float(sx) * sy) / float(denom)
        if denom != 0
        else 0.0
    )
    return pd.DataFrame(
        {
            "disc_cents": xs,
            "n_lines": ns,
            "mean_qty": _r6away(ys),
            "slope_qty_per_cent": np.full(k, float(_r6away(slope))),
        }
    )


ORACLES125["price_elasticity"] = """
WITH g AS (
  SELECT CAST(ROUND(l_discount * 100) AS BIGINT) AS disc_cents,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qc
  FROM lineitem GROUP BY 1
),
y AS (
  SELECT disc_cents, n,
         CAST(qc AS DOUBLE) / CAST(100.0 AS DOUBLE) / CAST(n AS DOUBLE)
           AS mean_qty
  FROM g
),
f AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(disc_cents) AS BIGINT) AS sx,
         CAST(SUM(disc_cents * disc_cents) AS BIGINT) AS sxx,
         list_sum(list(mean_qty ORDER BY disc_cents)) AS sy,
         list_sum(list(CAST(disc_cents AS DOUBLE) * mean_qty
                       ORDER BY disc_cents)) AS sxy
  FROM y
)
SELECT y.disc_cents, CAST(y.n AS BIGINT) AS n_lines,
       ROUND(y.mean_qty, 6) AS mean_qty,
       ROUND(CASE WHEN f.k * f.sxx - f.sx * f.sx <> 0
                  THEN (CAST(f.k AS DOUBLE) * f.sxy
                        - CAST(f.sx AS DOUBLE) * f.sy)
                       / CAST(f.k * f.sxx - f.sx * f.sx AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS slope_qty_per_cent
FROM y CROSS JOIN f
"""


QUERIES125["kaplan_meier"] = q_kaplan_meier
QUERIES125["interpurchase_time"] = q_interpurchase_time
QUERIES125["price_elasticity"] = q_price_elasticity
