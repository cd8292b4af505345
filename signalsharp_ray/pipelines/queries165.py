"""Round-5 batch 165: distribution distance and seasonal trend — the
1-D Wasserstein (earth-mover) distance between the two busiest event
types' value distributions (the transport metric that, unlike KS,
weights HOW FAR mass must move), and the seasonal Mann-Kendall test
(Hirsch & Slack 1984: the Mann-Kendall S summed within each hour-of-day
season over daily observations, so a diurnal cycle cannot masquerade as
trend).

House parity strategy: W1 uses exact centivalue integers — the CDF
steps are exact count ratios on the merged support and the integral is
an ascending-value fold of |F_a - F_b| x exact integer gaps (descaled
once); seasonal MK is pure integer S per season with the standard
no-ties variance sum and a single continuity-corrected z expression.

Scale contracts: W1's merged support is bounded by distinct
centivalues (a keyed exchange, the house value_histogram contract);
seasonal MK rides the bounded (hod x day) rollup."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .queries2 import _events, _r6

QUERIES165: dict = {}
ORACLES165: dict = {}


def q_wasserstein_value_dist(sf_dir: str):
    """W1 distance between the two busiest event types' per-event
    value distributions (count DESC, type ASC pair): integral of
    |F_a(x) - F_b(x)| over the merged exact-centivalue support.
    Output (type_a, type_b, n_a, n_b, wasserstein)."""
    from ..common.raytools import hash_bucket_aggregate

    ev = _events(sf_dir, ["event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64) * 100.0
        cents = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return pd.DataFrame(
            {"event_type": batch["event_type"], "cents": cents}
        )

    agg = (
        hash_bucket_aggregate(
            ev.map_batches(partial, batch_format="pandas"),
            ["event_type", "cents"],
            [],
            count_alias="n",
        )
        .to_pandas()
    )
    totals = agg.groupby("event_type")["n"].sum().astype(np.int64)
    order = sorted(totals.index, key=lambda t: (-int(totals[t]), t))
    a, b = order[0], order[1]
    na, nb = int(totals[a]), int(totals[b])
    ca = agg[agg["event_type"] == a].set_index("cents")["n"]
    cb = agg[agg["event_type"] == b].set_index("cents")["n"]
    support = sorted(set(ca.index) | set(cb.index))
    w = 0.0
    cum_a = 0
    cum_b = 0
    for i, x in enumerate(support[:-1]):  # ascending-value fold
        cum_a += int(ca.get(x, 0))
        cum_b += int(cb.get(x, 0))
        gap = support[i + 1] - x  # exact integer cents
        w += (
            abs(
                float(cum_a) / float(na) - float(cum_b) / float(nb)
            )
            * float(gap)
        )
    return pd.DataFrame(
        {
            "type_a": [a],
            "type_b": [b],
            "n_a": np.array([na], dtype=np.int64),
            "n_b": np.array([nb], dtype=np.int64),
            "wasserstein": _r6(np.array([w / 100.0])),
        }
    )


QUERIES165["wasserstein_value_dist"] = q_wasserstein_value_dist
ORACLES165["wasserstein_value_dist"] = """
WITH tc AS (SELECT event_type, COUNT(*) AS n FROM events GROUP BY 1),
t2 AS (
  SELECT event_type,
         row_number() OVER (ORDER BY n DESC, event_type ASC) AS rk
  FROM tc QUALIFY rk <= 2
),
c AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents,
         COUNT(*) AS n
  FROM events WHERE event_type IN (SELECT event_type FROM t2)
  GROUP BY 1, 2
),
sup AS (SELECT DISTINCT cents FROM c),
na_ AS (SELECT SUM(n) AS na FROM c
        WHERE event_type = (SELECT event_type FROM t2 WHERE rk = 1)),
nb_ AS (SELECT SUM(n) AS nb FROM c
        WHERE event_type = (SELECT event_type FROM t2 WHERE rk = 2)),
steps AS (
  SELECT sup.cents,
         SUM(CASE WHEN c.event_type =
                  (SELECT event_type FROM t2 WHERE rk = 1)
                  THEN c.n ELSE 0 END) AS da,
         SUM(CASE WHEN c.event_type =
                  (SELECT event_type FROM t2 WHERE rk = 2)
                  THEN c.n ELSE 0 END) AS db
  FROM sup LEFT JOIN c ON c.cents = sup.cents
  GROUP BY 1
),
cdf AS (
  SELECT cents,
         SUM(da) OVER (ORDER BY cents) AS cum_a,
         SUM(db) OVER (ORDER BY cents) AS cum_b,
         lead(cents) OVER (ORDER BY cents) AS nxt
  FROM steps
),
terms AS (
  SELECT cents,
         abs(CAST(cum_a AS DOUBLE) / CAST(na_.na AS DOUBLE)
             - CAST(cum_b AS DOUBLE) / CAST(nb_.nb AS DOUBLE))
           * CAST(nxt - cents AS DOUBLE) AS term
  FROM cdf, na_, nb_ WHERE nxt IS NOT NULL
)
SELECT (SELECT event_type FROM t2 WHERE rk = 1) AS type_a,
       (SELECT event_type FROM t2 WHERE rk = 2) AS type_b,
       CAST(na_.na AS BIGINT) AS n_a,
       CAST(nb_.nb AS BIGINT) AS n_b,
       ROUND((SELECT list_sum(list(term ORDER BY cents)) FROM terms)
             / 100.0, 6) AS wasserstein
FROM na_, nb_
"""


def q_seasonal_mann_kendall(sf_dir: str):
    """Per event_type: seasonal Mann-Kendall over the (hour-of-day x
    day) count matrix — S summed across the 24 hod seasons (each
    season's S compares its own days only), no-ties variance
    sum_h n_h(n_h-1)(2n_h+5)/18 and the continuity-corrected z. A pure
    diurnal cycle contributes nothing; a real multi-day drift does.
    Output (event_type, s_stat, var_s, z)."""
    from ..common.raytools import hash_bucket_aggregate

    ev = _events(sf_dir, ["ts", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].to_numpy("datetime64[us]").view(np.int64)
        day = us // 86_400_000_000
        hod = (us // 3_600_000_000) % 24
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "day": day.astype(np.int64),
                "hod": hod.astype(np.int64),
            }
        )

    agg = (
        hash_bucket_aggregate(
            ev.map_batches(partial, batch_format="pandas"),
            ["event_type", "day", "hod"],
            [],
            count_alias="n",
        )
        .to_pandas()
    )
    rows = []
    for et in sorted(agg["event_type"].unique()):
        g = agg[agg["event_type"] == et]
        s_total = 0
        var_total = 0
        for hod in range(24):
            gh = g[g["hod"] == hod].sort_values("day")
            v = gh["n"].to_numpy(np.int64)
            nh = len(v)
            if nh < 2:
                continue
            sgn = np.sign(v[None, :] - v[:, None])
            s_total += int(np.triu(sgn, 1).sum())
            var_total += nh * (nh - 1) * (2 * nh + 5)
        if var_total == 0:
            continue
        var_s = var_total / 18.0
        if s_total > 0:
            z = (float(s_total) - 1.0) / math.sqrt(var_s)
        elif s_total < 0:
            z = (float(s_total) + 1.0) / math.sqrt(var_s)
        else:
            z = 0.0
        rows.append(
            (
                et,
                np.int64(s_total),
                float(_r6(np.array([var_s]))[0]),
                float(_r6(np.array([z]))[0]),
            )
        )
    return pd.DataFrame(rows, columns=["event_type", "s_stat", "var_s", "z"])


QUERIES165["seasonal_mann_kendall"] = q_seasonal_mann_kendall
ORACLES165["seasonal_mann_kendall"] = """
WITH c AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
se AS (
  SELECT event_type, hod, list(n ORDER BY day) AS vs, COUNT(*) AS nh
  FROM c GROUP BY 1, 2
),
sk AS (
  SELECT event_type, hod, nh,
         CASE WHEN nh < 2 THEN 0
              ELSE CAST(list_sum(list_transform(range(1, nh),
                i -> list_sum(list_transform(range(i + 1, nh + 1),
                  j -> CASE WHEN vs[j] > vs[i] THEN 1
                            WHEN vs[j] < vs[i] THEN -1 ELSE 0 END))))
                AS BIGINT) END AS s_h,
         CASE WHEN nh < 2 THEN 0
              ELSE nh * (nh - 1) * (2 * nh + 5) END AS var18
  FROM se
),
ag AS (
  SELECT event_type,
         CAST(SUM(s_h) AS BIGINT) AS s_total,
         CAST(SUM(var18) AS BIGINT) AS var_total
  FROM sk GROUP BY 1 HAVING SUM(var18) > 0
)
SELECT event_type, s_total AS s_stat,
       ROUND(CAST(var_total AS DOUBLE) / 18.0, 6) AS var_s,
       ROUND(CASE WHEN s_total > 0
                  THEN (CAST(s_total AS DOUBLE) - 1.0)
                       / sqrt(CAST(var_total AS DOUBLE) / 18.0)
                  WHEN s_total < 0
                  THEN (CAST(s_total AS DOUBLE) + 1.0)
                       / sqrt(CAST(var_total AS DOUBLE) / 18.0)
                  ELSE 0.0 END, 6) AS z
FROM ag
"""
