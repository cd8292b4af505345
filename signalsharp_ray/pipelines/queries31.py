"""Round-3 batch 33: growth and consistency diagnostics — the user
acquisition curve (first-seen day per user, new users per day and the
cumulative total), supplier delivery consistency (population variance
of per-supplier lead times, worst 10), and the value-band x event-type
mix (which actions dominate each global value quartile band).

House parity: first-seen days are exact min-exchanges and the curve is
an integer cumulative window; lead-time variances combine exact integer
day power sums in one transcribed expression with deterministic
(variance DESC, suppkey ASC) ranking over identically-computed doubles;
value bands cut at exact nearest-rank global quartiles and every count
is an integer.

Scale contracts: per-user mins and per-supplier sums reduce through one
exchange each; the day curve is retention-bounded; the band mix is
4 x catalog bounded. The global quartiles follow the quantiles contract
(whole value column through one sorted kernel at test scale; the
t-digest entry is the documented sketch path).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries16 import _read

QUERIES31: dict = {}
ORACLES31: dict = {}

DAY_US = 86_400_000_000
WORST_K = 10


# ---------------------------------------------------------------------------
# User acquisition curve
# ---------------------------------------------------------------------------


def q_user_acquisition(sf_dir: str):
    """Per day: newly-acquired users (first event that day) and the
    cumulative user base — the growth curve behind dau_mau_stickiness.
    First-seen timestamps reduce through one min-exchange; the curve is
    an exact integer cumulative window."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "ts_us": b["ts"].to_numpy("datetime64[us]").view(np.int64),
            }
        )
        .groupby("user_id", sort=False)["ts_us"]
        .min()
        .reset_index(),
        batch_format="pandas",
    )
    first = hash_bucket_aggregate(ev, ["user_id"], [("ts_us", "min")])
    per_day = hash_bucket_aggregate(
        first.map_batches(
            lambda b: pd.DataFrame(
                {
                    "day_us": (b["ts_us_min"].astype(np.int64) // DAY_US) * DAY_US,
                    "n": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["day_us"],
        [("n", "sum")],
    ).to_pandas().sort_values("day_us")
    cum = np.cumsum(per_day["n_sum"].to_numpy(np.int64))
    return pd.DataFrame(
        {
            "day_us": per_day["day_us"].to_numpy(np.int64),
            "new_users": per_day["n_sum"].to_numpy(np.int64),
            "cumulative_users": cum,
        }
    ).reset_index(drop=True)


ORACLES31["user_acquisition"] = """
WITH f AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events GROUP BY 1
),
d AS (
  SELECT date_trunc('day', first_ts) AS day, COUNT(*) AS n
  FROM f GROUP BY 1
)
SELECT CAST(epoch_us(day) AS BIGINT) AS day_us,
       CAST(n AS BIGINT) AS new_users,
       CAST(SUM(n) OVER (ORDER BY day) AS BIGINT) AS cumulative_users
FROM d
"""


# ---------------------------------------------------------------------------
# Supplier delivery consistency (worst-10 lead-time variance)
# ---------------------------------------------------------------------------


def q_supplier_consistency(sf_dir: str):
    """The 10 suppliers with the most ERRATIC delivery (highest
    population variance of lineitem ship lag vs order date, ties by
    suppkey) — consistency matters more than speed for planning. Power
    sums are exact integer days; the variance expression and ranking
    are computed identically on both engines."""
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
                "date_us": b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(li, orders, on=["orderkey"], how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        d = (b["ship_us"].astype(np.int64) - b["date_us"].astype(np.int64)) // DAY_US
        g = (
            pd.DataFrame({"suppkey": b["suppkey"].astype(np.int64), "d": d})
            .assign(
                n=lambda x: np.ones(len(x), dtype=np.int64),
                d2=lambda x: x["d"] * x["d"],
            )
            .groupby("suppkey", sort=False)
            .agg(n=("n", "sum"), s=("d", "sum"), ss=("d2", "sum"))
            .reset_index()
        )
        return g

    agg = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["suppkey"],
        [("n", "sum"), ("s", "sum"), ("ss", "sum")],
    ).to_pandas()
    n = agg["n_sum"].astype(np.int64)
    s = agg["s_sum"].astype(np.int64)
    ss = agg["ss_sum"].astype(np.int64)
    var = [
        float(int(ssi)) / float(int(ni))
        - (float(int(si)) / float(int(ni))) * (float(int(si)) / float(int(ni)))
        for ni, si, ssi in zip(n, s, ss)
    ]
    out = pd.DataFrame(
        {
            "suppkey": agg["suppkey"].astype(np.int64),
            "n_items": n,
            "mean_lag": [
                float(_r6away(float(int(si)) / float(int(ni))))
                for ni, si in zip(n, s)
            ],
            "var_lag": [float(_r6away(v)) for v in var],
            "_raw_var": var,
        }
    )
    out = (
        out.sort_values(["_raw_var", "suppkey"], ascending=[False, True])
        .head(WORST_K)
        .drop(columns="_raw_var")
        .reset_index(drop=True)
    )
    out.insert(0, "rank", np.arange(1, len(out) + 1, dtype=np.int64))
    return out


ORACLES31["supplier_consistency"] = f"""
WITH j AS (
  SELECT l.l_suppkey AS sk,
         (epoch_us(l.l_shipdate) - epoch_us(o.o_orderdate)) // 86400000000 AS d
  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
),
a AS (
  SELECT sk, COUNT(*) AS n,
         CAST(SUM(d) AS BIGINT) AS s,
         CAST(SUM(d::HUGEINT * d::HUGEINT) AS BIGINT) AS ss
  FROM j GROUP BY 1
),
v AS (
  SELECT sk, n, s,
         CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var
  FROM a
),
r AS (
  SELECT sk, n, s, var,
         ROW_NUMBER() OVER (ORDER BY var DESC, sk ASC) AS rank
  FROM v
)
SELECT CAST(rank AS BIGINT) AS rank,
       sk AS suppkey,
       CAST(n AS BIGINT) AS n_items,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_lag,
       ROUND(var, 6) AS var_lag
FROM r WHERE rank <= {WORST_K}
"""


# ---------------------------------------------------------------------------
# Value-band x event-type mix
# ---------------------------------------------------------------------------


def q_value_band_mix(sf_dir: str):
    """Event counts per (global value quartile band, event type) with
    the share within each band — which actions dominate cheap vs
    expensive events. Band edges are exact nearest-rank global
    quartiles of the centivalue (quantiles contract); banding and
    counting are pure integer comparisons."""
    ev = _events(sf_dir, ["event_type", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {"event_type": b["event_type"], "c": _cents(b["value"])}
        ),
        batch_format="pandas",
    ).to_pandas()  # quantiles contract: global order statistics
    c = np.sort(ev["c"].to_numpy(np.int64))
    n = c.size
    q = lambda p: int(c[(p * n + 99) // 100 - 1])
    q1, q2, q3 = q(25), q(50), q(75)
    v = ev["c"].to_numpy(np.int64)
    band = np.full(n, 4, dtype=np.int64)
    band[v <= q3] = 3
    band[v <= q2] = 2
    band[v <= q1] = 1
    g = (
        pd.DataFrame({"band": band, "event_type": ev["event_type"]})
        .groupby(["band", "event_type"], sort=True)
        .size()
        .reset_index(name="n")
    )
    band_tot = g.groupby("band")["n"].transform("sum").astype(np.int64)
    share = [
        float(_r6away(float(int(x)) / float(int(t))))
        for x, t in zip(g["n"], band_tot)
    ]
    return pd.DataFrame(
        {
            "band": g["band"].astype(np.int64),
            "event_type": g["event_type"],
            "n_events": g["n"].astype(np.int64),
            "band_share": share,
        }
    )


ORACLES31["value_band_mix"] = """
WITH c AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT c,
         ROW_NUMBER() OVER (ORDER BY c) AS rn,
         COUNT(*) OVER () AS cnt
  FROM c
),
q AS (
  SELECT MAX(CASE WHEN rn = (25 * cnt + 99) // 100 THEN c END) AS q1,
         MAX(CASE WHEN rn = (50 * cnt + 99) // 100 THEN c END) AS q2,
         MAX(CASE WHEN rn = (75 * cnt + 99) // 100 THEN c END) AS q3
  FROM r
),
b AS (
  SELECT CASE WHEN c.c <= q.q1 THEN 1
              WHEN c.c <= q.q2 THEN 2
              WHEN c.c <= q.q3 THEN 3
              ELSE 4 END AS band,
         c.event_type
  FROM c CROSS JOIN q
),
a AS (SELECT band, event_type, COUNT(*) AS n FROM b GROUP BY 1, 2)
SELECT CAST(band AS BIGINT) AS band,
       event_type,
       CAST(n AS BIGINT) AS n_events,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY band) AS DOUBLE), 6)
         AS band_share
FROM a
"""


QUERIES31["user_acquisition"] = q_user_acquisition
QUERIES31["supplier_consistency"] = q_supplier_consistency
QUERIES31["value_band_mix"] = q_value_band_mix
