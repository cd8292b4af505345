"""Round-3 batch 45: regime-dynamics and growth diagnostics — the
hour-to-hour transition matrix of load QUARTILE states (a Markov chain
over load levels: do busy hours follow busy hours — the state-space
twin of load_regime_runs), order-value statistics by priority (do
urgent orders cost more, exact cents moments), and week-over-week load
growth (ln ratio of consecutive weekly totals).

House parity: state boundaries are exact nearest-rank quartiles of the
dense totals; state assignment and transition counts are pure integer
comparisons with one probability division; value moments combine exact
cents power sums (HUGEINT squares); weekly growth is ln of exact
integer counts (libm == DuckDB).

Scale contracts: the state matrix is 4x4; weekly tables are
retention-bounded; per-priority moments are one exchange.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries14 import _dense_totals
from .queries16 import _cents_col, _read

QUERIES43: dict = {}
ORACLES43: dict = {}

WEEK_US = 7 * 86_400_000_000


# ---------------------------------------------------------------------------
# Load-state transition matrix
# ---------------------------------------------------------------------------


def q_load_state_transitions(sf_dir: str):
    """Transition counts and conditional probabilities between load
    quartile states of consecutive hours on the dense total grid
    (state = 1..4 by the exact nearest-rank quartiles of the grid
    itself) — a sticky diagonal means regimes persist; a flat matrix
    means hours are memoryless. Pure integer state assignment; one
    probability division per cell."""
    v = _dense_totals(sf_dir)
    c = np.sort(v)
    n = c.size
    q = lambda p: int(c[(p * n + 99) // 100 - 1])
    q1, q2, q3 = q(25), q(50), q(75)
    state = np.full(n, 4, dtype=np.int64)
    state[v <= q3] = 3
    state[v <= q2] = 2
    state[v <= q1] = 1
    pairs = (
        pd.DataFrame({"from_state": state[:-1], "to_state": state[1:]})
        .groupby(["from_state", "to_state"], sort=True)
        .size()
        .reset_index(name="n")
    )
    from_tot = pairs.groupby("from_state")["n"].transform("sum").astype(np.int64)
    prob = [
        float(_r6away(float(int(x)) / float(int(t))))
        for x, t in zip(pairs["n"], from_tot)
    ]
    return pd.DataFrame(
        {
            "from_state": pairs["from_state"].astype(np.int64),
            "to_state": pairs["to_state"].astype(np.int64),
            "n_transitions": pairs["n"].astype(np.int64),
            "prob": prob,
        }
    )


ORACLES43["load_state_transitions"] = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT CAST(COALESCE(h.n, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY g.bh) - 1 AS idx
  FROM grid g LEFT JOIN h USING (bh)
),
r AS (
  SELECT v, ROW_NUMBER() OVER (ORDER BY v) AS rn, COUNT(*) OVER () AS cnt
  FROM dense
),
qq AS (
  SELECT MAX(CASE WHEN rn = (25 * cnt + 99) // 100 THEN v END) AS q1,
         MAX(CASE WHEN rn = (50 * cnt + 99) // 100 THEN v END) AS q2,
         MAX(CASE WHEN rn = (75 * cnt + 99) // 100 THEN v END) AS q3
  FROM r
),
st AS (
  SELECT d.idx,
         CASE WHEN d.v <= qq.q1 THEN 1
              WHEN d.v <= qq.q2 THEN 2
              WHEN d.v <= qq.q3 THEN 3
              ELSE 4 END AS s
  FROM dense d CROSS JOIN qq
),
p AS (
  SELECT a.s AS from_state, b.s AS to_state, COUNT(*) AS n
  FROM st a JOIN st b ON b.idx = a.idx + 1
  GROUP BY 1, 2
)
SELECT CAST(from_state AS BIGINT) AS from_state,
       CAST(to_state AS BIGINT) AS to_state,
       CAST(n AS BIGINT) AS n_transitions,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_state) AS DOUBLE), 6)
         AS prob
FROM p
"""


# ---------------------------------------------------------------------------
# Order value statistics by priority
# ---------------------------------------------------------------------------


def q_order_value_by_priority(sf_dir: str):
    """Per order priority: count, mean order value, and the coefficient
    of variation over exact cents power sums — does urgency correlate
    with stake. One exchange; two transcribed expressions."""
    def partial(b: pd.DataFrame) -> pd.DataFrame:
        c = _cents_col(b["o_totalprice"])
        df = pd.DataFrame({"priority": b["o_orderpriority"], "c": c})
        out = []
        for pr, grp in df.groupby("priority", sort=False):
            v = grp["c"].to_numpy()
            # cents^2 sums overflow int64 at scale: 2^32-base limbs
            # (the weekend_effect pattern)
            q = sum(int(x) * int(x) for x in v)
            out.append(
                (pr, int(v.size), int(v.sum()), q >> 32, q & ((1 << 32) - 1))
            )
        return pd.DataFrame(
            out, columns=["priority", "n", "s", "q_hi", "q_lo"]
        ).astype({"n": np.int64, "s": np.int64, "q_hi": np.int64, "q_lo": np.int64})

    orders = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]).map_batches(
        partial, batch_format="pandas"
    )
    agg = hash_bucket_aggregate(
        orders,
        ["priority"],
        [("n", "sum"), ("s", "sum"), ("q_hi", "sum"), ("q_lo", "sum")],
    ).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        n, s = int(r["n_sum"]), int(r["s_sum"])
        ss = (int(r["q_hi_sum"]) << 32) + int(r["q_lo_sum"])
        nf = float(n)
        mu = float(s) / nf
        var = float(ss) / nf - mu * mu
        cv = math.sqrt(var) / mu
        rows.append(
            (
                r["priority"],
                n,
                float(_r6away(mu / 100.0)),
                float(_r6away(cv)),
            )
        )
    return (
        pd.DataFrame(rows, columns=["priority", "n_orders", "mean_value", "cv"])
        .astype({"n_orders": np.int64})
        .sort_values("priority")
        .reset_index(drop=True)
    )


ORACLES43["order_value_by_priority"] = """
WITH a AS (
  SELECT o_orderpriority AS priority,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
         SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)::HUGEINT
             * CAST(ROUND(o_totalprice * 100) AS BIGINT)::HUGEINT) AS ss
  FROM orders GROUP BY 1
),
m AS (
  SELECT priority, n, ss,
         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
         CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS var
  FROM a
)
SELECT priority,
       CAST(n AS BIGINT) AS n_orders,
       ROUND(mu / 100.0, 6) AS mean_value,
       ROUND(sqrt(var) / mu, 6) AS cv
FROM m
"""


# ---------------------------------------------------------------------------
# Week-over-week load growth
# ---------------------------------------------------------------------------


def q_weekly_growth(sf_dir: str):
    """Per week (epoch-aligned 7-day bins): total events and the ln
    growth ratio vs the previous week (first week omitted) — the
    growth diagnostic one level above daily noise. Counts are exact
    integers; growth is ln of their ratio (libm == DuckDB)."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "week_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // WEEK_US
                )
                * WEEK_US,
            }
        )
        .groupby("week_us", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(ev, ["week_us"], [("n", "sum")])
        .to_pandas()
        .sort_values("week_us")
        .reset_index(drop=True)
    )
    rows = []
    for i in range(1, len(agg)):
        cur = int(agg["n_sum"].iloc[i])
        prev = int(agg["n_sum"].iloc[i - 1])
        rows.append(
            (
                int(agg["week_us"].iloc[i]),
                cur,
                prev,
                float(_r6away(math.log(float(cur)) - math.log(float(prev)))),
            )
        )
    return pd.DataFrame(
        rows, columns=["week_us", "n_events", "n_prev", "ln_growth"]
    ).astype({"week_us": np.int64, "n_events": np.int64, "n_prev": np.int64})


ORACLES43["weekly_growth"] = """
WITH w AS (
  SELECT (epoch_us(ts) // 604800000000) * 604800000000 AS week_us,
         COUNT(*) AS n
  FROM events GROUP BY 1
),
g AS (
  SELECT week_us, n,
         LAG(n) OVER (ORDER BY week_us) AS prev
  FROM w
)
SELECT CAST(week_us AS BIGINT) AS week_us,
       CAST(n AS BIGINT) AS n_events,
       CAST(prev AS BIGINT) AS n_prev,
       ROUND(ln(CAST(n AS DOUBLE)) - ln(CAST(prev AS DOUBLE)), 6) AS ln_growth
FROM g WHERE prev IS NOT NULL
"""


QUERIES43["load_state_transitions"] = q_load_state_transitions
QUERIES43["order_value_by_priority"] = q_order_value_by_priority
QUERIES43["weekly_growth"] = q_weekly_growth
