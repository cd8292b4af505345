"""Round-3 batch 31: cross-entity dependence — pairwise vocabulary
overlap between sources (exact Jaccard of vocabulary sets — the
corpus-mixing redundancy check), the Pearson correlation between a
customer's account balance and their average order value (exact cents
power sums), and tail co-exceedance of the two busiest event streams
(do their p90 load spikes hit the same hours — the correlated-failure
gauge).

House parity: vocabulary intersections/unions are exact integer counts
from the (source, token) exchange; the correlation is the transcribed
Pearson over exact int64/HUGEINT sums (gap_autocorr recipe); p90
thresholds are exact nearest-rank order statistics and all exceedance
counts are integer comparisons, with the busiest pair selected by
deterministic (total DESC, type ASC) order.

Scale contracts: vocab presence reduces by token with a
sources-bounded bitmask (no token list leaves the exchange); the
balance join is co-partitioned on custkey; hourly grids are
retention-bounded.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _r6away
from .queries6 import HOUR_US, _hourly_counts
from .queries16 import _cents_col, _read
from .queries17 import _per_token_counts

QUERIES29: dict = {}
ORACLES29: dict = {}


# ---------------------------------------------------------------------------
# Pairwise vocabulary overlap between sources
# ---------------------------------------------------------------------------


def q_vocab_overlap(sf_dir: str):
    """For every source pair: vocabulary sizes, intersection, union and
    exact Jaccard — how redundant two slices of the corpus are before
    mixing. Token presence collapses to per-token source sets inside
    the exchange; only counts reach the driver."""
    per_tok = _per_token_counts(sf_dir)

    def presence(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "tok": batch["tok"],
                "source": batch["source"],
                "one": np.ones(len(batch), dtype=np.int64),
            }
        )

    # (source, tok) rows are already distinct post-exchange; reduce to
    # per-(source-pair) intersection counts via per-token source lists
    tbl = per_tok.map_batches(presence, batch_format="pandas").to_pandas()
    sources = sorted(tbl["source"].unique())
    vocab = {s: set() for s in sources}
    for s, t in zip(tbl["source"], tbl["tok"]):
        vocab[s].add(t)
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1 :]:
            inter = len(vocab[a] & vocab[b])
            union = len(vocab[a] | vocab[b])
            rows.append(
                (
                    a,
                    b,
                    len(vocab[a]),
                    len(vocab[b]),
                    inter,
                    union,
                    float(_r6away(float(inter) / float(union))),
                )
            )
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "vocab_a", "vocab_b", "intersection",
                 "vocab_union", "jaccard"],
    ).astype(
        {
            "vocab_a": np.int64,
            "vocab_b": np.int64,
            "intersection": np.int64,
            "vocab_union": np.int64,
        }
    )


ORACLES29["vocab_overlap"] = """
WITH t AS (
  SELECT DISTINCT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
v AS (SELECT source, COUNT(DISTINCT tok) AS nv FROM t GROUP BY 1),
p AS (
  SELECT a.source AS source_a, b.source AS source_b,
         COUNT(*) AS inter
  FROM t a JOIN t b ON b.tok = a.tok AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.source_a, p.source_b,
       CAST(va.nv AS BIGINT) AS vocab_a,
       CAST(vb.nv AS BIGINT) AS vocab_b,
       CAST(p.inter AS BIGINT) AS intersection,
       CAST(va.nv + vb.nv - p.inter AS BIGINT) AS vocab_union,
       ROUND(CAST(p.inter AS DOUBLE)
             / CAST(va.nv + vb.nv - p.inter AS DOUBLE), 6) AS jaccard
FROM p
JOIN v va ON va.source = p.source_a
JOIN v vb ON vb.source = p.source_b
"""


# ---------------------------------------------------------------------------
# Customer balance vs average order value correlation
# ---------------------------------------------------------------------------


def q_balance_order_corr(sf_dir: str):
    """Pearson correlation between customer account balance and total
    order spend across customers with orders — do rich accounts order
    big. Both sides are exact int64 cents; per-customer totals reduce
    through one exchange, join the customer table co-partitioned, and
    the correlation is one transcribed expression over exact
    HUGEINT-safe power sums."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "spend": _cents_col(b["o_totalprice"]),
            }
        )
        .groupby("custkey", sort=False)["spend"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_cust = hash_bucket_aggregate(orders, ["custkey"], [("spend", "sum")])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["c_custkey"].astype(np.int64),
                "bal": _cents_col(b["c_acctbal"]),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_cust, cust, on=["custkey"], how="inner").to_pandas()
    x = joined["bal"].to_numpy(np.int64)
    y = joined["spend_sum"].to_numpy(np.int64)
    n = int(x.size)
    sx = int(x.sum())
    sy = int(y.sum())
    sxx = sum(int(v) * int(v) for v in x)
    syy = sum(int(v) * int(v) for v in y)
    sxy = sum(int(a) * int(b) for a, b in zip(x, y))
    num = float(n) * float(sxy) - float(sx) * float(sy)
    dx = float(n) * float(sxx) - float(sx) * float(sx)
    dy = float(n) * float(syy) - float(sy) * float(sy)
    r = num / (math.sqrt(dx) * math.sqrt(dy))
    return pd.DataFrame(
        {
            "n_customers": np.array([n], dtype=np.int64),
            "corr": [float(_r6away(r))],
        }
    )


ORACLES29["balance_order_corr"] = """
WITH o AS (
  SELECT o_custkey AS ck,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend
  FROM orders GROUP BY 1
),
j AS (
  SELECT CAST(ROUND(c.c_acctbal * 100) AS BIGINT) AS x, o.spend AS y
  FROM o JOIN customer c ON c.c_custkey = o.ck
),
a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS BIGINT) AS sx,
         CAST(SUM(y) AS BIGINT) AS sy,
         SUM(x::HUGEINT * x::HUGEINT) AS sxx,
         SUM(y::HUGEINT * y::HUGEINT) AS syy,
         SUM(x::HUGEINT * y::HUGEINT) AS sxy
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_customers,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
FROM a
"""


# ---------------------------------------------------------------------------
# Tail co-exceedance of the two busiest streams
# ---------------------------------------------------------------------------


def q_co_exceedance(sf_dir: str):
    """For the two busiest event types ((total DESC, type ASC) order):
    how often their hourly loads exceed their OWN p90 thresholds in the
    same hour — co-exceedance = P(both | either), the correlated-spike
    gauge for capacity planning. Thresholds are exact nearest-rank
    order statistics over present hours; all exceedance counts are
    integer comparisons on the shared hour grid."""
    agg = _hourly_counts(sf_dir)
    totals = (
        agg.groupby("event_type")["n_sum"]
        .sum()
        .reset_index()
        .sort_values(["n_sum", "event_type"], ascending=[False, True])
    )
    tx, ty = totals["event_type"].iloc[0], totals["event_type"].iloc[1]
    lo = int(agg["hour_us"].min())
    hi = int(agg["hour_us"].max())
    grid_n = (hi - lo) // HOUR_US + 1

    def dense_and_thr(t):
        g = agg[agg["event_type"] == t]
        v = np.zeros(grid_n, dtype=np.int64)
        v[(g["hour_us"].to_numpy(np.int64) - lo) // HOUR_US] = g["n_sum"].to_numpy(
            np.int64
        )
        present = np.sort(g["n_sum"].to_numpy(np.int64))
        n = present.size
        thr = int(present[(90 * n + 99) // 100 - 1])
        return v, thr

    vx, thx = dense_and_thr(tx)
    vy, thy = dense_and_thr(ty)
    ax = vx > thx
    ay = vy > thy
    n_both = int((ax & ay).sum())
    n_either = int((ax | ay).sum())
    ratio = float(n_both) / float(n_either) if n_either else 0.0
    return pd.DataFrame(
        {
            "type_x": [tx],
            "type_y": [ty],
            "thr_x": np.array([thx], dtype=np.int64),
            "thr_y": np.array([thy], dtype=np.int64),
            "n_hours": np.array([grid_n], dtype=np.int64),
            "n_both": np.array([n_both], dtype=np.int64),
            "n_either": np.array([n_either], dtype=np.int64),
            "co_exceedance": [float(_r6away(ratio))],
        }
    )


ORACLES29["co_exceedance"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(n) AS BIGINT) AS s
  FROM h GROUP BY 1
),
pick AS (
  SELECT event_type,
         ROW_NUMBER() OVER (ORDER BY s DESC, event_type ASC) AS rn
  FROM tot
),
tx AS (SELECT event_type FROM pick WHERE rn = 1),
ty AS (SELECT event_type FROM pick WHERE rn = 2),
thr AS (
  SELECT event_type, n AS thr
  FROM (
    SELECT event_type, n,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS rn,
           COUNT(*) OVER (PARTITION BY event_type) AS cnt
    FROM h
  )
  WHERE rn = (90 * cnt + 99) // 100
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT g.bh,
         CAST(COALESCE(hx.n, 0) AS BIGINT) AS vx,
         CAST(COALESCE(hy.n, 0) AS BIGINT) AS vy
  FROM grid g
  LEFT JOIN h hx ON hx.bh = g.bh AND hx.event_type = (SELECT * FROM tx)
  LEFT JOIN h hy ON hy.bh = g.bh AND hy.event_type = (SELECT * FROM ty)
),
f AS (
  SELECT COUNT(*) AS n_hours,
         CAST(COUNT(*) FILTER (WHERE vx > thx.thr AND vy > thy2.thr)
           AS BIGINT) AS n_both,
         CAST(COUNT(*) FILTER (WHERE vx > thx.thr OR vy > thy2.thr)
           AS BIGINT) AS n_either,
         MAX(thx.thr) AS thr_x, MAX(thy2.thr) AS thr_y
  FROM dense
  CROSS JOIN (SELECT thr FROM thr WHERE event_type = (SELECT * FROM tx)) thx
  CROSS JOIN (SELECT thr FROM thr WHERE event_type = (SELECT * FROM ty)) thy2
)
SELECT (SELECT * FROM tx) AS type_x,
       (SELECT * FROM ty) AS type_y,
       CAST(thr_x AS BIGINT) AS thr_x,
       CAST(thr_y AS BIGINT) AS thr_y,
       CAST(n_hours AS BIGINT) AS n_hours,
       n_both, n_either,
       ROUND(CASE WHEN n_either > 0
                  THEN CAST(n_both AS DOUBLE) / CAST(n_either AS DOUBLE)
                  ELSE 0.0 END, 6) AS co_exceedance
FROM f
"""


QUERIES29["vocab_overlap"] = q_vocab_overlap
QUERIES29["balance_order_corr"] = q_balance_order_corr
QUERIES29["co_exceedance"] = q_co_exceedance
