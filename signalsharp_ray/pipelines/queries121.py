"""Round-4 batch 121: shape comparison and classical homogeneity tests —
exact-integer Dynamic Time Warping between hour-of-day load profiles
(the elastic-shape distance behind series clustering, with its rigid L1
baseline beside it), Bartlett's test of equal value variances across
event types, the Friedman rank test of day-blocked type loads, and the
exact-binomial sign test between calendar halves.

House parity: DTW runs on 24-point integer profiles with |a-b| cell
costs, so the whole DP table is exact int64 on the engine side and an
exact anti-diagonal wavefront recursion (two carried diagonals) in the
recursive-CTE oracle — zero float surface; Bartlett's statistic is
transcribed op-for-op over exact centivalue power sums with math.log
(libm == DuckDB ln bitwise) and ascending-type folds; Friedman average
ranks are dyadic rationals (ties add halves), their sums exact doubles,
the chi-square one shared expression; the sign test's p-value is the
exact binomial tail 2*sum C(m,i)/2^m over Python/DuckDB integer
factorials — a rational number, not an approximation.

Scale contracts: hour-of-day and daily profiles reduce through one
bucketed exchange and are catalog x 24 / retention-bounded; every DP /
rank fold runs over those bounded profiles, never the event table."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries6 import HOUR_US
from .queries120 import _daily_counts

QUERIES121: dict = {}
ORACLES121: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Exact-integer DTW between hour-of-day profiles
# ---------------------------------------------------------------------------


def _hod_profiles(sf_dir: str) -> pd.DataFrame:
    """(event_type, hod, n_sum) — 24 rows per type via one exchange."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hod = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
        ) % 24
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "hod": hod.astype(np.int64),
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["event_type", "hod"], sort=False)
            .sum()
            .reset_index()
        )

    return hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "ts"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "hod"],
        [("n", "sum")],
    ).to_pandas()


def q_dtw_hour_profiles(sf_dir: str):
    """Dynamic Time Warping distance between every event-type pair's
    24-point hour-of-day count profile (|a - b| cell cost, full window,
    the classic O(n*m) DP), next to the rigid L1 distance — DTW <= L1
    always, and the gap measures how much phase shift separates the two
    shapes (e.g. the same diurnal curve 2 hours later). Profiles and
    every DP cell are exact int64, so the distance has no float surface
    at all; the oracle replays the identical DP as an anti-diagonal
    wavefront recursion."""
    prof = _hod_profiles(sf_dir)
    types = sorted(prof["event_type"].unique())
    vecs = {}
    for t in types:
        g = prof[prof["event_type"] == t]
        v = np.zeros(24, dtype=np.int64)
        v[g["hod"].to_numpy(np.int64)] = g["n_sum"].to_numpy(np.int64)
        vecs[t] = v
    rows = []
    for ai, ta in enumerate(types):
        for tb in types[ai + 1 :]:
            x, y = vecs[ta], vecs[tb]
            c = np.abs(x[:, None] - y[None, :])  # (24, 24) int64
            dp = np.zeros((24, 24), dtype=np.int64)
            dp[0, 0] = c[0, 0]
            for i in range(1, 24):
                dp[i, 0] = dp[i - 1, 0] + c[i, 0]
                dp[0, i] = dp[0, i - 1] + c[0, i]
            for i in range(1, 24):
                for j in range(1, 24):
                    dp[i, j] = c[i, j] + min(
                        dp[i - 1, j], dp[i, j - 1], dp[i - 1, j - 1]
                    )
            rows.append(
                (ta, tb, int(dp[23, 23]), int(np.abs(x - y).sum()))
            )
    return pd.DataFrame(
        rows, columns=["type_a", "type_b", "dtw_dist", "l1_dist"]
    ).astype({"dtw_dist": np.int64, "l1_dist": np.int64})


ORACLES121["dtw_hour_profiles"] = """
WITH RECURSIVE
h AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
types AS (SELECT DISTINCT event_type FROM h),
hours AS (SELECT unnest(generate_series(0, 23)) AS hod),
prof AS (
  SELECT t.event_type, hr.hod, CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN hours hr
  LEFT JOIN h ON h.event_type = t.event_type AND h.hod = hr.hod
),
pairs AS (
  SELECT a.event_type AS ta, b.event_type AS tb
  FROM types a JOIN types b ON a.event_type < b.event_type
),
cells AS (
  SELECT p.ta, p.tb, xa.hod AS i, xb.hod AS j, abs(xa.x - xb.x) AS c
  FROM pairs p
  JOIN prof xa ON xa.event_type = p.ta
  JOIN prof xb ON xb.event_type = p.tb
),
rec AS (
  SELECT ta, tb, 0 AS step, 0 AS diag, i, j, c AS dp
  FROM cells WHERE i = 0 AND j = 0
  UNION ALL
  SELECT * FROM (
    WITH w AS (SELECT * FROM rec)
    SELECT nc.ta, nc.tb, w2.step + 1 AS step, w2.step + 1 AS diag,
           nc.i, nc.j, nc.c + MIN(p.dp) AS dp
    FROM (SELECT DISTINCT step FROM w) w2
    JOIN cells nc ON nc.i + nc.j = w2.step + 1
    JOIN w p ON p.ta = nc.ta AND p.tb = nc.tb
            AND ((p.diag = w2.step
                  AND ((p.i = nc.i - 1 AND p.j = nc.j)
                    OR (p.i = nc.i AND p.j = nc.j - 1)))
              OR (p.diag = w2.step - 1
                  AND p.i = nc.i - 1 AND p.j = nc.j - 1))
    GROUP BY nc.ta, nc.tb, w2.step, nc.i, nc.j, nc.c
    UNION ALL
    SELECT ta, tb, step + 1, diag, i, j, dp FROM w
    WHERE diag = step AND step < 46
  )
),
dtw AS (
  SELECT ta, tb, MIN(dp) AS dtw_dist FROM rec
  WHERE i = 23 AND j = 23 GROUP BY 1, 2
),
l1 AS (
  SELECT p.ta, p.tb, SUM(abs(xa.x - xb.x)) AS l1_dist
  FROM pairs p
  JOIN prof xa ON xa.event_type = p.ta
  JOIN prof xb ON xb.event_type = p.tb AND xb.hod = xa.hod
  GROUP BY 1, 2
)
SELECT d.ta AS type_a, d.tb AS type_b,
       CAST(d.dtw_dist AS BIGINT) AS dtw_dist,
       CAST(l.l1_dist AS BIGINT) AS l1_dist
FROM dtw d JOIN l1 l ON l.ta = d.ta AND l.tb = d.tb
"""


# ---------------------------------------------------------------------------
# Bartlett's test of equal variances across event types
# ---------------------------------------------------------------------------


def q_bartlett_test(sf_dir: str):
    """Bartlett's homogeneity-of-variance test over event types (exact
    centivalues): T = ((N-k) ln Sp^2 - sum (n_i-1) ln s_i^2) / C with
    C = 1 + (sum 1/(n_i-1) - 1/(N-k)) / (3(k-1)) — the gate before any
    pooled-variance ANOVA. Every s_i^2 derives from exact int64/HUGEINT
    power sums; the three cross-type folds run in ascending event_type
    order on both engines."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "n": np.ones(len(batch), dtype=np.int64),
                    "s": c,
                    "ss": c * c,
                }
            )
            .groupby(["event_type"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type"],
            [("n", "sum"), ("s", "sum"), ("ss", "sum")],
        )
        .to_pandas()
        .sort_values("event_type")
    )
    ns = agg["n_sum"].to_numpy(np.int64)
    k = int((ns >= 2).sum())
    if k < 2:
        return pd.DataFrame(
            {
                "k_types": pd.Series([], dtype=np.int64),
                "n_total": pd.Series([], dtype=np.int64),
                "bartlett_t": pd.Series([], dtype=np.float64),
            }
        )
    num_pool = 0.0
    sum_ln = 0.0
    sum_inv = 0.0
    n_total = 0
    for _, r in agg.iterrows():
        n = int(r["n_sum"])
        if n < 2:
            continue  # oracle HAVING COUNT(*) >= 2
        s = int(r["s_sum"])
        ss = int(r["ss_sum"])
        var = (float(ss) - float(s) * float(s) / float(n)) / float(n - 1)
        num_pool = num_pool + float(n - 1) * var
        sum_ln = sum_ln + float(n - 1) * math.log(var)
        sum_inv = sum_inv + 1.0 / float(n - 1)
        n_total += n
    sp2 = num_pool / float(n_total - k)
    t_num = float(n_total - k) * math.log(sp2) - sum_ln
    c_corr = 1.0 + (sum_inv - 1.0 / float(n_total - k)) / (3.0 * float(k - 1))
    t = t_num / c_corr
    return pd.DataFrame(
        {
            "k_types": np.array([k], dtype=np.int64),
            "n_total": np.array([n_total], dtype=np.int64),
            "bartlett_t": [float(_r6away(t))],
        }
    )


ORACLES121["bartlett_test"] = """
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c FROM events
),
g AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM b GROUP BY 1 HAVING COUNT(*) >= 2
),
v AS (
  SELECT event_type, n,
         (CAST(ss AS DOUBLE)
          - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
         / CAST(n - 1 AS DOUBLE) AS var
  FROM g
),
f AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(n) AS BIGINT) AS n_total,
         list_sum(list(CAST(n - 1 AS DOUBLE) * var ORDER BY event_type))
           AS num_pool,
         list_sum(list(CAST(n - 1 AS DOUBLE) * ln(var) ORDER BY event_type))
           AS sum_ln,
         list_sum(list(CAST(1.0 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
                       ORDER BY event_type)) AS sum_inv
  FROM v
)
SELECT k AS k_types, n_total,
       ROUND((CAST(n_total - k AS DOUBLE)
                * ln(num_pool / CAST(n_total - k AS DOUBLE)) - sum_ln)
             / (CAST(1.0 AS DOUBLE)
                + (sum_inv - CAST(1.0 AS DOUBLE) / CAST(n_total - k AS DOUBLE))
                  / (CAST(3.0 AS DOUBLE) * CAST(k - 1 AS DOUBLE))), 6)
         AS bartlett_t
FROM f WHERE k >= 2
"""


# ---------------------------------------------------------------------------
# Friedman rank test over day-blocked type loads
# ---------------------------------------------------------------------------


def q_friedman_test(sf_dir: str):
    """Friedman's rank test with days as blocks and event types as
    treatments: within each dense-grid day, the k types' counts are
    average-ranked (ties share the mean rank — a dyadic rational, so
    rank sums are exact doubles); chi2 = 12/(n k (k+1)) sum R_j^2
    - 3 n (k+1) (uncorrected for ties, stated on both sides). Emits one
    row per type with its rank sum and mean rank plus the shared
    chi-square."""
    agg = _daily_counts(sf_dir)
    lo = int(agg["day_us"].min())
    hi = int(agg["day_us"].max())
    grid = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    types = sorted(agg["event_type"].unique())
    k = len(types)
    n = int(grid.size)
    mat = np.zeros((k, n), dtype=np.int64)
    for i, t in enumerate(types):
        g = agg[agg["event_type"] == t]
        mat[i, (g["day_us"].to_numpy(np.int64) - lo) // DAY_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
    ranks = np.zeros((k, n), dtype=np.float64)
    for d in range(n):
        ranks[:, d] = pd.Series(mat[:, d]).rank(method="average").to_numpy()
    rsum = ranks.sum(axis=1)  # sums of dyadic rationals: exact
    ssq = 0.0
    for j in range(k):  # ascending-type fold
        ssq = ssq + rsum[j] * rsum[j]
    chi2 = (
        12.0 / (float(n) * float(k) * float(k + 1)) * ssq
        - 3.0 * float(n) * float(k + 1)
    )
    return pd.DataFrame(
        {
            "event_type": types,
            "rank_sum": _r6away(rsum),
            "mean_rank": _r6away(rsum / float(n)),
            "n_days": np.full(k, n, dtype=np.int64),
            "chi2_friedman": np.full(k, float(_r6away(chi2))),
        }
    )


ORACLES121["friedman_test"] = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS bd, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bd) AS lo, MAX(bd) AS hi FROM d),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bd FROM bounds
),
types AS (SELECT DISTINCT event_type FROM d),
dense AS (
  SELECT t.event_type, g.bd, CAST(COALESCE(d.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN d ON d.event_type = t.event_type AND d.bd = g.bd
),
r AS (
  SELECT event_type, bd,
         CAST(RANK() OVER (PARTITION BY bd ORDER BY x) AS DOUBLE)
           + (CAST(COUNT(*) OVER (PARTITION BY bd, x) AS DOUBLE)
              - CAST(1.0 AS DOUBLE)) * CAST(0.5 AS DOUBLE) AS avg_rank
  FROM dense
),
rs AS (
  SELECT event_type, SUM(avg_rank) AS rank_sum FROM r GROUP BY 1
),
p AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         (SELECT COUNT(*) FROM grid) AS n,
         list_sum(list(rank_sum * rank_sum ORDER BY event_type)) AS ssq
  FROM rs
)
SELECT rs.event_type,
       ROUND(rs.rank_sum, 6) AS rank_sum,
       ROUND(rs.rank_sum / CAST(p.n AS DOUBLE), 6) AS mean_rank,
       CAST(p.n AS BIGINT) AS n_days,
       ROUND(CAST(12.0 AS DOUBLE)
               / (CAST(p.n AS DOUBLE) * CAST(p.k AS DOUBLE)
                  * CAST(p.k + 1 AS DOUBLE)) * p.ssq
             - CAST(3.0 AS DOUBLE) * CAST(p.n AS DOUBLE)
               * CAST(p.k + 1 AS DOUBLE), 6) AS chi2_friedman
FROM rs CROSS JOIN p
"""


# ---------------------------------------------------------------------------
# Exact-binomial sign test between calendar halves
# ---------------------------------------------------------------------------


def q_sign_test_halves(sf_dir: str):
    """Paired sign test per event type: day i of the first calendar half
    pairs with day i + n//2 of the second (the middle day of an odd span
    is unpaired); pos/neg count strictly increased/decreased pairs (ties
    drop). The two-sided p-value is the EXACT binomial tail
    min(1, 2 * sum_{i<=min(pos,neg)} C(m,i) / 2^m) over integer
    factorials — a rational with no approximation anywhere."""
    agg = _daily_counts(sf_dir)
    lo = int(agg["day_us"].min())
    hi = int(agg["day_us"].max())
    grid = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    n_days = int(grid.size)
    h = n_days // 2
    rows = []
    for t in sorted(agg["event_type"].unique()):
        g = agg[agg["event_type"] == t]
        v = np.zeros(n_days, dtype=np.int64)
        v[(g["day_us"].to_numpy(np.int64) - lo) // DAY_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
        first, second = v[:h], v[h : 2 * h]
        pos = int((second > first).sum())
        neg = int((second < first).sum())
        m = pos + neg
        if m == 0:
            p = 1.0
        else:
            kmin = min(pos, neg)
            tail = sum(math.comb(m, i) for i in range(kmin + 1))
            p = min(1.0, 2.0 * float(tail) / float(2**m))
        rows.append((t, pos, neg, float(_r6away(p))))
    return pd.DataFrame(
        rows, columns=["event_type", "n_pos", "n_neg", "p_sign"]
    ).astype({"n_pos": np.int64, "n_neg": np.int64})


ORACLES121["sign_test_halves"] = """
WITH d AS (
  SELECT event_type, date_trunc('day', ts) AS bd, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bd) AS lo, MAX(bd) AS hi FROM d),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bd FROM bounds
),
types AS (SELECT DISTINCT event_type FROM d),
dense AS (
  SELECT t.event_type, g.bd,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bd) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(d.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN d ON d.event_type = t.event_type AND d.bd = g.bd
),
params AS (SELECT COUNT(*) // 2 AS h FROM grid),
paired AS (
  SELECT a.event_type,
         COUNT(*) FILTER (WHERE b.x > a.x) AS pos,
         COUNT(*) FILTER (WHERE b.x < a.x) AS neg
  FROM dense a
  JOIN params p ON a.idx < p.h
  JOIN dense b ON b.event_type = a.event_type AND b.idx = a.idx + p.h
  GROUP BY 1
),
tails AS (
  SELECT event_type, pos, neg, pos + neg AS m,
         least(pos, neg) AS kmin
  FROM paired
),
pv AS (
  SELECT t.event_type, t.pos, t.neg,
         CASE WHEN t.m = 0 THEN CAST(1.0 AS DOUBLE)
              ELSE least(CAST(1.0 AS DOUBLE),
                         CAST(2.0 AS DOUBLE)
                         * CAST((SELECT SUM(factorial(CAST(t.m AS INTEGER))
                                          // (factorial(CAST(i.i AS INTEGER))
                                              * factorial(CAST(t.m - i.i
                                                               AS INTEGER))))
                                 FROM (SELECT unnest(generate_series(0, t.kmin))
                                         AS i) i) AS DOUBLE)
                         / CAST(2 ** t.m AS DOUBLE))
         END AS p_sign
  FROM tails t
)
SELECT event_type, CAST(pos AS BIGINT) AS n_pos, CAST(neg AS BIGINT) AS n_neg,
       ROUND(p_sign, 6) AS p_sign
FROM pv
"""


QUERIES121["dtw_hour_profiles"] = q_dtw_hour_profiles
QUERIES121["bartlett_test"] = q_bartlett_test
QUERIES121["friedman_test"] = q_friedman_test
QUERIES121["sign_test_halves"] = q_sign_test_halves
