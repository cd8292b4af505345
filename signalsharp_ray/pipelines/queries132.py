"""Round-4 batch 132: epidemiology-flavoured inference over the event
stream — the weekend-purchase odds ratio with its Wald confidence
interval (the 2x2-table effect size), Lincoln-Petersen / Chapman
capture-recapture population estimates from the two calendar halves
(how many users exist beyond the ones we saw), market-basket lift for
the top co-purchase pairs (PMI's retail cousin), and a Poisson
goodness-of-fit chi-square for hourly arrivals (is the stream actually
Poisson, or bursty).

House parity: every 2x2 / capture / pair count is an exact integer;
odds ratio, CI bounds (math.log/exp/sqrt == DuckDB ln/exp/sqrt), lift
and Poisson pmf terms (exp(-lambda) * lambda^k / k! with libm pow and
exact factorials) are transcribed op-for-op; chi-square folds ascending
k with the tail bucket appended last on both sides; basket-lift ranking
uses (count DESC, pa, pb) determinism.

Scale contracts: all partials pre-reduce inside map_batches and
exchange bounded keys ((half, user) pairs, (pa, pb) pairs, count
histograms); nothing corpus-sized touches the driver."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries6 import HOUR_US, _hourly_counts
from .queries8 import _dense_by_type

QUERIES132: dict = {}
ORACLES132: dict = {}

DAY_US = 86_400_000_000
LIFT_TOP_K = 50
POIS_CAP = 15


# ---------------------------------------------------------------------------
# Weekend-purchase odds ratio
# ---------------------------------------------------------------------------


def q_odds_ratio_weekend_purchase(sf_dir: str):
    """One row: the odds ratio of an event being a purchase on weekends
    vs weekdays, with the 95% Wald CI exp(ln OR +- 1.96 sqrt(1/a + 1/b +
    1/c + 1/d)) — the 2x2-table effect size behind "do weekends convert
    better". Cell counts are exact; OR and the CI bounds are transcribed
    float expressions."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        wk = (((ts // DAY_US) + 3) % 7 >= 5).astype(np.int64)
        buy = (batch["event_type"].to_numpy() == "purchase").astype(np.int64)
        row = pd.DataFrame(
            {
                "a": wk * buy,
                "b": wk * (1 - buy),
                "c": (1 - wk) * buy,
                "d": (1 - wk) * (1 - buy),
            }
        ).sum().to_frame().T
        row.insert(0, "g", np.zeros(1, dtype=np.int64))
        return row

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["ts", "event_type"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["g"],
            [("a", "sum"), ("b", "sum"), ("c", "sum"), ("d", "sum")],
        )
        .to_pandas()
    )
    a = int(agg["a_sum"].sum())
    b = int(agg["b_sum"].sum())
    c = int(agg["c_sum"].sum())
    d = int(agg["d_sum"].sum())
    if min(a, b, c, d) == 0:
        return pd.DataFrame(
            {
                "n_weekend_purchase": pd.Series([], dtype=np.int64),
                "n_weekend_other": pd.Series([], dtype=np.int64),
                "n_weekday_purchase": pd.Series([], dtype=np.int64),
                "n_weekday_other": pd.Series([], dtype=np.int64),
                "odds_ratio": pd.Series([], dtype=np.float64),
                "ci_low": pd.Series([], dtype=np.float64),
                "ci_high": pd.Series([], dtype=np.float64),
            }
        )
    orr = float(a) * float(d) / (float(b) * float(c))
    se = math.sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    lo = math.exp(math.log(orr) - 1.96 * se)
    hi = math.exp(math.log(orr) + 1.96 * se)
    return pd.DataFrame(
        {
            "n_weekend_purchase": np.array([a], dtype=np.int64),
            "n_weekend_other": np.array([b], dtype=np.int64),
            "n_weekday_purchase": np.array([c], dtype=np.int64),
            "n_weekday_other": np.array([d], dtype=np.int64),
            "odds_ratio": [float(_r6away(orr))],
            "ci_low": [float(_r6away(lo))],
            "ci_high": [float(_r6away(hi))],
        }
    )


ORACLES132["odds_ratio_weekend_purchase"] = """
WITH b AS (
  SELECT CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 >= 5
              THEN 1 ELSE 0 END AS wk,
         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS buy
  FROM events
),
t AS (
  SELECT CAST(COUNT(*) FILTER (WHERE wk = 1 AND buy = 1) AS BIGINT) AS a,
         CAST(COUNT(*) FILTER (WHERE wk = 1 AND buy = 0) AS BIGINT) AS b,
         CAST(COUNT(*) FILTER (WHERE wk = 0 AND buy = 1) AS BIGINT) AS c,
         CAST(COUNT(*) FILTER (WHERE wk = 0 AND buy = 0) AS BIGINT) AS d
  FROM b
),
f AS (
  SELECT a, b, c, d,
         CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
           / (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)) AS orr,
         sqrt(CAST(1.0 AS DOUBLE) / a + CAST(1.0 AS DOUBLE) / b
              + CAST(1.0 AS DOUBLE) / c + CAST(1.0 AS DOUBLE) / d) AS se
  FROM t WHERE least(a, b, c, d) > 0
)
SELECT a AS n_weekend_purchase, b AS n_weekend_other,
       c AS n_weekday_purchase, d AS n_weekday_other,
       ROUND(orr, 6) AS odds_ratio,
       ROUND(exp(ln(orr) - CAST(1.96 AS DOUBLE) * se), 6) AS ci_low,
       ROUND(exp(ln(orr) + CAST(1.96 AS DOUBLE) * se), 6) AS ci_high
FROM f
"""


# ---------------------------------------------------------------------------
# Capture-recapture population estimate
# ---------------------------------------------------------------------------


def q_capture_recapture(sf_dir: str):
    """One row: users seen in the first calendar half (n1), the second
    half (n2), both (m), and the Lincoln-Petersen (n1*n2/m) and Chapman
    ((n1+1)(n2+1)/(m+1) - 1) estimates of the TOTAL user population —
    how many users exist that we never saw. Membership reduces through
    one (user, half) exchange; both estimators are single transcribed
    expressions over exact integers."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
        )
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].to_numpy(np.int64),
                "day": day,
            }
        ).drop_duplicates()

    pairs = _events(sf_dir, ["user_id", "ts"]).map_batches(
        partial, batch_format="pandas"
    )
    spans = hash_bucket_aggregate(
        pairs.map_batches(
            lambda b: pd.DataFrame(
                {
                    "user_id": b["user_id"].to_numpy(np.int64),
                    "f": b["day"].to_numpy(np.int64),
                    "l": b["day"].to_numpy(np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["user_id"],
        [("f", "min"), ("l", "max")],
    )
    lo = int(spans.min("f_min"))
    hi = int(spans.max("l_max"))
    mid = lo + (hi - lo) // 2  # first half: day <= mid

    def flags(batch: pd.DataFrame) -> pd.DataFrame:
        first = batch["f_min"].to_numpy(np.int64) <= mid
        second = batch["l_max"].to_numpy(np.int64) > mid
        return pd.DataFrame(
            {
                "g": np.zeros(1, dtype=np.int64),
                "n1": np.array([int(first.sum())], dtype=np.int64),
                "n2": np.array([int(second.sum())], dtype=np.int64),
                "m": np.array([int((first & second).sum())], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        spans.map_batches(flags, batch_format="pandas"),
        ["g"],
        [("n1", "sum"), ("n2", "sum"), ("m", "sum")],
    ).to_pandas()
    n1 = int(agg["n1_sum"].sum())
    n2 = int(agg["n2_sum"].sum())
    m = int(agg["m_sum"].sum())
    if m == 0:
        return pd.DataFrame(
            {
                "n_first": pd.Series([], dtype=np.int64),
                "n_second": pd.Series([], dtype=np.int64),
                "n_both": pd.Series([], dtype=np.int64),
                "lincoln_petersen": pd.Series([], dtype=np.float64),
                "chapman": pd.Series([], dtype=np.float64),
            }
        )
    lp = float(n1) * float(n2) / float(m)
    ch = float(n1 + 1) * float(n2 + 1) / float(m + 1) - 1.0
    return pd.DataFrame(
        {
            "n_first": np.array([n1], dtype=np.int64),
            "n_second": np.array([n2], dtype=np.int64),
            "n_both": np.array([m], dtype=np.int64),
            "lincoln_petersen": [float(_r6away(lp))],
            "chapman": [float(_r6away(ch))],
        }
    )


ORACLES132["capture_recapture"] = """
WITH u AS (
  SELECT user_id,
         MIN(epoch_us(ts) // 86400000000) AS f,
         MAX(epoch_us(ts) // 86400000000) AS l
  FROM events GROUP BY 1
),
p AS (
  SELECT MIN(f) AS lo, MAX(l) AS hi,
         MIN(f) + (MAX(l) - MIN(f)) // 2 AS mid
  FROM u
),
t AS (
  SELECT CAST(COUNT(*) FILTER (WHERE u.f <= p.mid) AS BIGINT) AS n1,
         CAST(COUNT(*) FILTER (WHERE u.l > p.mid) AS BIGINT) AS n2,
         CAST(COUNT(*) FILTER (WHERE u.f <= p.mid AND u.l > p.mid)
              AS BIGINT) AS m
  FROM u CROSS JOIN p
)
SELECT n1 AS n_first, n2 AS n_second, m AS n_both,
       ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / CAST(m AS DOUBLE), 6)
         AS lincoln_petersen,
       ROUND(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
             / CAST(m + 1 AS DOUBLE) - CAST(1.0 AS DOUBLE), 6) AS chapman
FROM t WHERE m > 0
"""


# ---------------------------------------------------------------------------
# Market-basket lift for top co-purchase pairs
# ---------------------------------------------------------------------------


def q_basket_lift(sf_dir: str, k: int = LIFT_TOP_K):
    """Top-K co-purchase pairs by distinct-order co-occurrence (count
    DESC, pa, pb), each with lift = N * c_ab / (c_a * c_b) over
    order-level supports — lift > 1 means the pair attracts, < 1 means
    it repels (PMI's exponentiated retail cousin). All supports are
    exact distinct-order integers; lift is one transcribed expression."""
    import ray.data as rd

    li = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def pairs(df: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(df["l_partkey"].to_numpy(np.int64))
        if parts.size < 2:
            return pd.DataFrame(
                {
                    "pa": pd.Series([], dtype=np.int64),
                    "pb": pd.Series([], dtype=np.int64),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        ii, jj = np.triu_indices(parts.size, k=1)
        return pd.DataFrame(
            {
                "pa": parts[ii],
                "pb": parts[jj],
                "n": np.ones(ii.size, dtype=np.int64),
            }
        )

    per_order = bucketed_map_groups(li, ["l_orderkey"], pairs)
    pair_counts = hash_bucket_aggregate(
        per_order, ["pa", "pb"], [("n", "sum")]
    ).to_pandas()

    def part_support(df: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(df["l_partkey"].to_numpy(np.int64))
        return pd.DataFrame(
            {"part": parts, "n": np.ones(parts.size, dtype=np.int64)}
        )

    supports = (
        hash_bucket_aggregate(
            bucketed_map_groups(li, ["l_orderkey"], part_support),
            ["part"],
            [("n", "sum")],
        )
        .to_pandas()
        .set_index("part")["n_sum"]
    )
    # distinct order count via one tiny aggregate, not a driver pull:
    def order_ids(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "ok": np.unique(batch["l_orderkey"].to_numpy(np.int64)),
                "n": 1,
            }
        )

    n_orders = len(
        hash_bucket_aggregate(
            li.map_batches(order_ids, batch_format="pandas"),
            ["ok"],
            [("n", "min")],
        ).to_pandas()
    )
    top = pair_counts.sort_values(
        ["n_sum", "pa", "pb"], ascending=[False, True, True]
    ).head(k)
    rows = []
    for _, r in top.iterrows():
        pa, pb, cab = int(r["pa"]), int(r["pb"]), int(r["n_sum"])
        ca, cb = int(supports.loc[pa]), int(supports.loc[pb])
        lift = float(n_orders) * float(cab) / (float(ca) * float(cb))
        rows.append((pa, pb, cab, ca, cb, float(_r6away(lift))))
    return pd.DataFrame(
        rows, columns=["pa", "pb", "n_both", "n_a", "n_b", "lift"]
    ).astype(
        {
            "pa": np.int64,
            "pb": np.int64,
            "n_both": np.int64,
            "n_a": np.int64,
            "n_b": np.int64,
        }
    )


ORACLES132["basket_lift"] = f"""
WITH pr AS (
  SELECT DISTINCT a.l_orderkey, a.l_partkey AS pa, b.l_partkey AS pb
  FROM lineitem a
  JOIN lineitem b ON b.l_orderkey = a.l_orderkey
                 AND b.l_partkey > a.l_partkey
),
pc AS (SELECT pa, pb, COUNT(*) AS cab FROM pr GROUP BY 1, 2),
sup AS (
  SELECT l_partkey AS part, COUNT(DISTINCT l_orderkey) AS c
  FROM lineitem GROUP BY 1
),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem),
top AS (
  SELECT pa, pb, cab FROM pc
  QUALIFY ROW_NUMBER() OVER (ORDER BY cab DESC, pa ASC, pb ASC)
          <= {LIFT_TOP_K}
)
SELECT t.pa, t.pb, CAST(t.cab AS BIGINT) AS n_both,
       CAST(sa.c AS BIGINT) AS n_a, CAST(sb.c AS BIGINT) AS n_b,
       ROUND(CAST(n.n_orders AS DOUBLE) * CAST(t.cab AS DOUBLE)
             / (CAST(sa.c AS DOUBLE) * CAST(sb.c AS DOUBLE)), 6) AS lift
FROM top t
JOIN sup sa ON sa.part = t.pa
JOIN sup sb ON sb.part = t.pb
CROSS JOIN n
"""


# ---------------------------------------------------------------------------
# Poisson goodness-of-fit for hourly arrivals
# ---------------------------------------------------------------------------


def q_poisson_goodness_of_fit(sf_dir: str):
    """Per event_type: chi-square of the hourly-count histogram against
    Poisson(lambda = mean hourly count) with counts capped into a >= 15
    tail bucket — "is this stream Poisson or bursty", the assumption
    check behind every sqrt(n) error bar. Observed cells are exact
    integers; expected cells n*exp(-l)*l^k/k! use libm exp/pow and
    exact factorials; the chi-square folds k ascending with the tail
    appended last."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    rows = []
    for ti, t in enumerate(types):
        v = mat[ti]
        s = int(v.sum())
        lam = float(s) / float(n)
        if lam <= 0.0:
            continue
        obs = np.zeros(POIS_CAP + 1, dtype=np.int64)
        for x in v:
            obs[min(int(x), POIS_CAP)] += 1
        chi2 = 0.0
        pmf_sum = 0.0
        for k in range(POIS_CAP):
            pmf = (
                math.exp(-lam) * lam**k / float(math.factorial(k))
            )
            pmf_sum = pmf_sum + pmf
            e = float(n) * pmf
            o = float(obs[k])
            chi2 = chi2 + (o - e) * (o - e) / e
        e_tail = float(n) * (1.0 - pmf_sum)
        if e_tail > 0.0:
            o_tail = float(obs[POIS_CAP])
            chi2 = chi2 + (o_tail - e_tail) * (o_tail - e_tail) / e_tail
        rows.append((t, n, float(_r6away(lam)), float(_r6away(chi2))))
    return pd.DataFrame(
        rows, columns=["event_type", "n_hours", "lam", "chi2_poisson"]
    ).astype({"n_hours": np.int64})


ORACLES132["poisson_goodness_of_fit"] = f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
types AS (SELECT DISTINCT event_type FROM h),
dense AS (
  SELECT t.event_type, g.bh, CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
s AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS total,
         CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS lam
  FROM dense GROUP BY 1 HAVING SUM(x) > 0
),
obs AS (
  SELECT d.event_type, least(d.x, {POIS_CAP}) AS k, COUNT(*) AS o
  FROM dense d GROUP BY 1, 2
),
ks AS (SELECT unnest(generate_series(0, {POIS_CAP - 1})) AS k),
body AS (
  SELECT s.event_type, ks.k,
         CAST(COALESCE(obs.o, 0) AS DOUBLE) AS o,
         CAST(s.n AS DOUBLE)
           * (exp(-s.lam) * (s.lam ** ks.k)
              / CAST(factorial(CAST(ks.k AS INTEGER)) AS DOUBLE)) AS e,
         exp(-s.lam) * (s.lam ** ks.k)
           / CAST(factorial(CAST(ks.k AS INTEGER)) AS DOUBLE) AS pmf
  FROM s CROSS JOIN ks
  LEFT JOIN obs ON obs.event_type = s.event_type AND obs.k = ks.k
),
agg AS (
  SELECT event_type,
         list_sum(list((o - e) * (o - e) / e ORDER BY k)) AS chi2_body,
         list_sum(list(pmf ORDER BY k)) AS pmf_sum
  FROM body GROUP BY 1
),
tails AS (
  SELECT s.event_type, s.n, s.lam, a.chi2_body, a.pmf_sum,
         CAST(s.n AS DOUBLE) * (CAST(1.0 AS DOUBLE) - a.pmf_sum) AS e_tail,
         CAST(COALESCE((SELECT o FROM obs
                        WHERE obs.event_type = s.event_type
                          AND obs.k = {POIS_CAP}), 0) AS DOUBLE) AS o_tail
  FROM s JOIN agg a USING (event_type)
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       ROUND(lam, 6) AS lam,
       ROUND(chi2_body
             + CASE WHEN e_tail > 0
                    THEN (o_tail - e_tail) * (o_tail - e_tail) / e_tail
                    ELSE CAST(0.0 AS DOUBLE) END, 6) AS chi2_poisson
FROM tails
"""


QUERIES132["odds_ratio_weekend_purchase"] = q_odds_ratio_weekend_purchase
QUERIES132["capture_recapture"] = q_capture_recapture
QUERIES132["basket_lift"] = q_basket_lift
QUERIES132["poisson_goodness_of_fit"] = q_poisson_goodness_of_fit
