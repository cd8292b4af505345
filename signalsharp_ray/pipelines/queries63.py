"""Round-3 batch 65: rank- and association-statistics — Spearman rank
correlation between lineitem quantity and discount (both columns are
bounded-cardinality, so average ranks derive exactly from the joint
value histogram rather than a global sort), Kendall tau-b between daily
order count and daily revenue (calendar-bounded all-pairs concordance),
and Cramer's V over the order priority x status contingency table.

House parity: ranks are kept as 2x-scaled integers (2r = 2*cum_before
+ cnt + 1, always integral even for midpoint average ranks), so every
Spearman power sum is an exact Python-int / HUGEINT reduction with ONE
double conversion at the end; Kendall concordance counts are pure
integer pair sums; the chi-square folds over the dense ascending
(priority, status) grid including zero cells.

Scale contracts: spearman moves only a <=550-cell joint histogram;
kendall's all-pairs runs over the calendar-bounded daily table (~2.5k
rows, driver-side numpy outer); cramers_v is one 15-cell exchange.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _r6away
from .queries16 import _cents_col, _read

QUERIES63: dict = {}
ORACLES63: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Spearman rank correlation: quantity vs discount
# ---------------------------------------------------------------------------


def _avg_rank2(values: np.ndarray, counts: np.ndarray) -> dict:
    """2x-scaled average (midrank) per distinct value, from the sorted
    value histogram: 2r = 2*cum_before + cnt + 1 (exact integer)."""
    order = np.argsort(values, kind="stable")
    v = values[order]
    c = counts[order]
    cum_before = np.concatenate(([0], np.cumsum(c)[:-1]))
    r2 = 2 * cum_before + c + 1
    return {int(val): int(r) for val, r in zip(v, r2)}


def q_spearman_qty_discount(sf_dir: str):
    """Spearman rank correlation between lineitem quantity (integer
    units) and discount (exact percent points) — the rank-based
    bulk-discount screen that, unlike qty_price_corr's Pearson, is
    insensitive to the price magnitudes. Both columns have bounded
    cardinality, so ranks come exactly from the value histogram and
    every power sum is an exact integer."""
    li = _read(sf_dir, "lineitem", ["l_quantity", "l_discount"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "q": np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64),
                "d": _cents_col(b["l_discount"]),
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby(["q", "d"], sort=False)
        .agg(n=("n", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    joint = (
        hash_bucket_aggregate(li, ["q", "d"], [("n", "sum")])
        .to_pandas()
        .sort_values(["q", "d"])
    )
    qv = joint["q"].to_numpy(np.int64)
    dv = joint["d"].to_numpy(np.int64)
    nv = joint["n_sum"].to_numpy(np.int64)

    qh = pd.DataFrame({"v": qv, "n": nv}).groupby("v")["n"].sum()
    dh = pd.DataFrame({"v": dv, "n": nv}).groupby("v")["n"].sum()
    rq = _avg_rank2(qh.index.to_numpy(np.int64), qh.to_numpy(np.int64))
    rd = _avg_rank2(dh.index.to_numpy(np.int64), dh.to_numpy(np.int64))

    n_tot = 0
    sx = sy = sxx = syy = sxy = 0
    for q, d, n in zip(qv, dv, nv):
        x = rq[int(q)]
        y = rd[int(d)]
        n = int(n)
        n_tot += n
        sx += n * x
        sy += n * y
        sxx += n * x * x
        syy += n * y * y
        sxy += n * x * y
    num = float(n_tot * sxy - sx * sy)
    dx = float(n_tot * sxx - sx * sx)
    dy = float(n_tot * syy - sy * sy)
    rho = num / (math.sqrt(dx) * math.sqrt(dy))
    return pd.DataFrame(
        {
            "n_items": np.array([n_tot], dtype=np.int64),
            "n_qty_levels": np.array([len(rq)], dtype=np.int64),
            "n_disc_levels": np.array([len(rd)], dtype=np.int64),
            "spearman": [float(_r6away(rho))],
        }
    )


ORACLES63["spearman_qty_discount"] = """
WITH l AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
         CAST(ROUND(l_discount * 100) AS BIGINT) AS d
  FROM lineitem
),
joint AS (SELECT q, d, COUNT(*) AS n FROM l GROUP BY 1, 2),
qh AS (SELECT q, SUM(n) AS n FROM joint GROUP BY 1),
dh AS (SELECT d, SUM(n) AS n FROM joint GROUP BY 1),
qr AS (
  SELECT q,
         2 * (SUM(n) OVER (ORDER BY q
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n) + n + 1 AS r2
  FROM qh
),
dr AS (
  SELECT d,
         2 * (SUM(n) OVER (ORDER BY d
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n) + n + 1 AS r2
  FROM dh
),
s AS (
  SELECT SUM(j.n) AS n_tot,
         SUM(j.n * qr.r2) AS sx,
         SUM(j.n * dr.r2) AS sy,
         SUM(j.n * qr.r2 * qr.r2) AS sxx,
         SUM(j.n * dr.r2 * dr.r2) AS syy,
         SUM(j.n * qr.r2 * dr.r2) AS sxy
  FROM joint j JOIN qr ON qr.q = j.q JOIN dr ON dr.d = j.d
)
SELECT CAST(n_tot AS BIGINT) AS n_items,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM qh) AS n_qty_levels,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM dh) AS n_disc_levels,
       ROUND(CAST(n_tot * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n_tot * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n_tot * syy - sy * sy AS DOUBLE))), 6)
         AS spearman
FROM s
"""


# ---------------------------------------------------------------------------
# Kendall tau-b: daily order count vs daily revenue
# ---------------------------------------------------------------------------


def q_kendall_tau_daily(sf_dir: str):
    """Kendall tau-b between the daily order count and the daily revenue
    (exact cents) across all order days — a tie-aware monotone
    association check on the two headline daily series. The daily table
    is calendar-bounded, so concordance runs as a driver-side numpy
    all-pairs over exact integers."""
    o = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "day": (
                    b["o_orderdate"].astype("datetime64[us]").astype("int64")
                    // DAY_US
                ),
                "n": np.ones(len(b), dtype=np.int64),
                "rev_c": _cents_col(b["o_totalprice"]),
            }
        )
        .groupby("day", sort=False)
        .agg(n=("n", "sum"), rev_c=("rev_c", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    daily = (
        hash_bucket_aggregate(o, ["day"], [("n", "sum"), ("rev_c", "sum")])
        .to_pandas()
        .sort_values("day")
    )
    x = daily["n_sum"].to_numpy(np.int64)
    y = daily["rev_c_sum"].to_numpy(np.int64)
    n = x.size
    sgx = np.sign(x[None, :] - x[:, None])
    sgy = np.sign(y[None, :] - y[:, None])
    iu = np.triu_indices(n, k=1)
    prod = sgx[iu] * sgy[iu]
    conc = int((prod > 0).sum())
    disc = int((prod < 0).sum())
    n0 = n * (n - 1) // 2
    tx = int((sgx[iu] == 0).sum())
    ty = int((sgy[iu] == 0).sum())
    denom = math.sqrt(float(n0 - tx)) * math.sqrt(float(n0 - ty))
    tau = float(conc - disc) / denom
    return pd.DataFrame(
        {
            "n_days": np.array([n], dtype=np.int64),
            "concordant": np.array([conc], dtype=np.int64),
            "discordant": np.array([disc], dtype=np.int64),
            "tau_b": [float(_r6away(tau))],
        }
    )


ORACLES63["kendall_tau_daily"] = """
WITH daily AS (
  SELECT CAST(epoch_us(o_orderdate) // 86400000000 AS BIGINT) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS rev_c
  FROM orders GROUP BY 1
),
pairs AS (
  SELECT CASE WHEN (b.n - a.n) * (b.rev_c - a.rev_c) > 0 THEN 1 ELSE 0 END
           AS conc,
         CASE WHEN (b.n - a.n) * (b.rev_c - a.rev_c) < 0 THEN 1 ELSE 0 END
           AS disc,
         CASE WHEN b.n = a.n THEN 1 ELSE 0 END AS tiex,
         CASE WHEN b.rev_c = a.rev_c THEN 1 ELSE 0 END AS tiey
  FROM daily a JOIN daily b ON b.day > a.day
),
s AS (
  SELECT SUM(conc) AS c, SUM(disc) AS d, SUM(tiex) AS tx, SUM(tiey) AS ty,
         COUNT(*) AS n0
  FROM pairs
),
nd AS (SELECT COUNT(*) AS n_days FROM daily)
SELECT CAST(nd.n_days AS BIGINT) AS n_days,
       CAST(s.c AS BIGINT) AS concordant,
       CAST(s.d AS BIGINT) AS discordant,
       ROUND(CAST(s.c - s.d AS DOUBLE)
             / (sqrt(CAST(s.n0 - s.tx AS DOUBLE))
                * sqrt(CAST(s.n0 - s.ty AS DOUBLE))), 6) AS tau_b
FROM s CROSS JOIN nd
"""


# ---------------------------------------------------------------------------
# Cramer's V: order priority x order status
# ---------------------------------------------------------------------------


def q_cramers_v_priority_status(sf_dir: str):
    """Cramer's V association between o_orderpriority and o_orderstatus,
    with the underlying chi-square over the DENSE contingency grid
    (zero cells included — expected counts exist wherever both margins
    do). One 15-cell exchange; the chi-square folds over ascending
    (priority, status)."""
    o = _read(sf_dir, "orders", ["o_orderpriority", "o_orderstatus"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "priority": b["o_orderpriority"],
                "status": b["o_orderstatus"],
                "n": np.ones(len(b), dtype=np.int64),
            }
        )
        .groupby(["priority", "status"], sort=False)
        .agg(n=("n", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    cnt = (
        hash_bucket_aggregate(o, ["priority", "status"], [("n", "sum")])
        .to_pandas()
    )
    pr = sorted(cnt["priority"].unique().tolist())
    st = sorted(cnt["status"].unique().tolist())
    obs = {
        (p, s): int(n)
        for p, s, n in zip(cnt["priority"], cnt["status"], cnt["n_sum"])
    }
    row_tot = {p: sum(obs.get((p, s), 0) for s in st) for p in pr}
    col_tot = {s: sum(obs.get((p, s), 0) for p in pr) for s in st}
    n_tot = sum(row_tot.values())
    chi2 = 0.0
    for p in pr:
        for s in st:
            e = float(row_tot[p]) * float(col_tot[s]) / float(n_tot)
            o_ = float(obs.get((p, s), 0))
            chi2 = chi2 + (o_ - e) * (o_ - e) / e
    k = min(len(pr), len(st)) - 1
    v = math.sqrt(chi2 / (float(n_tot) * float(k)))
    return pd.DataFrame(
        {
            "n_orders": np.array([n_tot], dtype=np.int64),
            "n_priorities": np.array([len(pr)], dtype=np.int64),
            "n_statuses": np.array([len(st)], dtype=np.int64),
            "chi2": [float(_r6away(chi2))],
            "cramers_v": [float(_r6away(v))],
        }
    )


ORACLES63["cramers_v_priority_status"] = """
WITH c AS (
  SELECT o_orderpriority AS priority, o_orderstatus AS status,
         COUNT(*) AS n
  FROM orders GROUP BY 1, 2
),
pr AS (SELECT DISTINCT priority FROM c),
st AS (SELECT DISTINCT status FROM c),
dense AS (
  SELECT pr.priority, st.status, COALESCE(c.n, 0) AS o
  FROM pr CROSS JOIN st
  LEFT JOIN c ON c.priority = pr.priority AND c.status = st.status
),
rt AS (SELECT priority, SUM(o) AS r FROM dense GROUP BY 1),
ct AS (SELECT status, SUM(o) AS cc FROM dense GROUP BY 1),
tot AS (SELECT SUM(o) AS n FROM dense),
chi AS (
  SELECT list_sum(list(
           (CAST(d.o AS DOUBLE)
            - CAST(rt.r AS DOUBLE) * CAST(ct.cc AS DOUBLE)
              / CAST(t.n AS DOUBLE))
           * (CAST(d.o AS DOUBLE)
              - CAST(rt.r AS DOUBLE) * CAST(ct.cc AS DOUBLE)
                / CAST(t.n AS DOUBLE))
           / (CAST(rt.r AS DOUBLE) * CAST(ct.cc AS DOUBLE)
              / CAST(t.n AS DOUBLE))
           ORDER BY d.priority, d.status)) AS chi2
  FROM dense d
  JOIN rt ON rt.priority = d.priority
  JOIN ct ON ct.status = d.status
  CROSS JOIN tot t
),
k AS (
  SELECT LEAST((SELECT COUNT(*) FROM pr), (SELECT COUNT(*) FROM st)) - 1
           AS kk
)
SELECT CAST(t.n AS BIGINT) AS n_orders,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM pr) AS n_priorities,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM st) AS n_statuses,
       ROUND(chi.chi2, 6) AS chi2,
       ROUND(sqrt(chi.chi2 / (CAST(t.n AS DOUBLE) * CAST(k.kk AS DOUBLE))), 6)
         AS cramers_v
FROM chi CROSS JOIN tot t CROSS JOIN k
"""


QUERIES63["spearman_qty_discount"] = q_spearman_qty_discount
QUERIES63["kendall_tau_daily"] = q_kendall_tau_daily
QUERIES63["cramers_v_priority_status"] = q_cramers_v_priority_status
