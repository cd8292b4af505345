"""Round-4 batch 120: SRE alerting + anomaly-mining primitives — the
SLO error-budget burn-rate alert table (the multiwindow-burn paging rule
reduced to its hourly leg), a Shewhart 3-sigma control chart over the
dense hourly load with an INTEGER violation predicate, the
matrix-profile discord (the most anomalous week-long window of each
type's daily-count series, exact integer distances), and Welch's
unequal-variance t-test for weekend vs weekday values (the
heteroscedastic sibling of cohens_d_weekend).

House parity: burn-rate alerts fire on the cross-multiplied integer
predicate 10*bad > n (never a float share compare); Shewhart violations
fire on (x*n - s)^2 > 9*(q*n - s^2) — both sides of the 3-sigma rule
stay exact int64/HUGEINT, the reported z-score is one transcribed float
expression over the same integers; discord distances are exact integer
squared Euclidean (no z-normalization crosses the compare) with
(mp DESC, idx ASC) determinism; Welch's t and the Welch-Satterthwaite
df are transcribed op-for-op over exact centivalue power sums.

Scale contracts: burn partials and the weekend power sums pre-reduce
inside map_batches and exchange (type, hour) / (type, wk) keyed integer
rows; Shewhart and discord fold retention-bounded dense profiles
(~720 hourly / ~30 daily rows per type) on the driver, never the event
table."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries6 import HOUR_US, _hourly_counts
from .queries8 import _dense_by_type

QUERIES120: dict = {}
ORACLES120: dict = {}

DAY_US = 86_400_000_000
SLO_BAD_THRESHOLD = 100.0  # the apdex "tolerating" boundary on value
DISCORD_M = 7  # one-week window over the daily series


# ---------------------------------------------------------------------------
# SLO error-budget burn-rate alerts
# ---------------------------------------------------------------------------


def q_slo_burn_rate(sf_dir: str):
    """Hours where an event type burned its error budget faster than
    sustainable: with SLI = share of events at value <= 100 and a 90%
    SLO, burn rate = (bad/n) / (1 - 0.9) = 10*bad/n; the alert predicate
    burn > 1 is the exact integer cross-multiplication 10*bad > n (the
    hourly leg of Google's multiwindow burn alert). The reported burn is
    the one shared float division."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hour = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
        ) * HOUR_US
        bad = (batch["value"].to_numpy(np.float64) > SLO_BAD_THRESHOLD).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "hour_us": hour,
                    "n": np.ones(len(batch), dtype=np.int64),
                    "bad": bad,
                }
            )
            .groupby(["event_type", "hour_us"], sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "hour_us"],
        [("n", "sum"), ("bad", "sum")],
    ).to_pandas()
    n = agg["n_sum"].to_numpy(np.int64)
    bad = agg["bad_sum"].to_numpy(np.int64)
    keep = 10 * bad > n
    out = pd.DataFrame(
        {
            "event_type": agg["event_type"].to_numpy()[keep],
            "hour": agg["hour_us"].to_numpy(np.int64)[keep].astype(
                "datetime64[us]"
            ),
            "n_events": n[keep],
            "n_bad": bad[keep],
            "burn_rate": _r6away(
                10.0 * bad[keep].astype(np.float64) / n[keep].astype(np.float64)
            ),
        }
    )
    return out.astype({"n_events": np.int64, "n_bad": np.int64})


ORACLES120["slo_burn_rate"] = f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         COUNT(*) AS n,
         COUNT(*) FILTER (WHERE value > {SLO_BAD_THRESHOLD}) AS bad
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour,
       CAST(n AS BIGINT) AS n_events,
       CAST(bad AS BIGINT) AS n_bad,
       ROUND(CAST(10.0 AS DOUBLE) * CAST(bad AS DOUBLE) / CAST(n AS DOUBLE), 6)
         AS burn_rate
FROM h
WHERE 10 * bad > n
"""


# ---------------------------------------------------------------------------
# Shewhart 3-sigma control chart over the dense hourly load
# ---------------------------------------------------------------------------


def q_shewhart_violations(sf_dir: str):
    """Western-Electric rule 1 per event type: hours of the zero-filled
    dense hourly count series beyond mean +- 3 population sigma. The
    predicate is the fully-integer cross-multiplication
    (x*n - s)^2 > 9*(q*n - s^2) (s, q the exact count and square sums
    over the global grid), so violation membership has no float surface;
    the reported z = (x*n - s)/sqrt(q*n - s^2) is one transcribed
    expression. A flat series (sigma = 0) yields no violations because
    the strict inequality's left side is then identically zero."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        s = int(v.sum())
        q = int((v.astype(object) * v.astype(object)).sum())
        var_num = q * n - s * s  # n^2 * population variance, exact int
        lhs = (v.astype(object) * n - s) ** 2
        viol = np.nonzero(np.array([x > 9 * var_num for x in lhs]))[0]
        for j in viol:
            x = int(v[j])
            z = (float(x) * float(n) - float(s)) / math.sqrt(float(var_num))
            rows.append((t, int(grid[j]), x, float(_r6away(z))))
    out = pd.DataFrame(
        rows, columns=["event_type", "hour_us", "n_events", "zscore"]
    )
    if len(out) == 0:
        out = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "hour_us": pd.Series([], dtype=np.int64),
                "n_events": pd.Series([], dtype=np.int64),
                "zscore": pd.Series([], dtype=np.float64),
            }
        )
    out["hour"] = out["hour_us"].astype("datetime64[us]")
    return out.drop(columns=["hour_us"]).astype(
        {"n_events": np.int64, "zscore": np.float64}
    )


ORACLES120["shewhart_violations"] = """
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
  SELECT t.event_type, g.bh,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
stat AS (
  SELECT event_type, CAST(COUNT(*) AS HUGEINT) AS n,
         CAST(SUM(x) AS HUGEINT) AS s,
         SUM(CAST(x AS HUGEINT) * x) AS q
  FROM dense GROUP BY 1
)
SELECT d.event_type, d.bh AS hour, CAST(d.x AS BIGINT) AS n_events,
       ROUND((CAST(d.x AS DOUBLE) * CAST(st.n AS DOUBLE) - CAST(st.s AS DOUBLE))
             / sqrt(CAST(st.q * st.n - st.s * st.s AS DOUBLE)), 6) AS zscore
FROM dense d JOIN stat st USING (event_type)
WHERE (CAST(d.x AS HUGEINT) * st.n - st.s) * (CAST(d.x AS HUGEINT) * st.n - st.s)
      > 9 * (st.q * st.n - st.s * st.s)
"""


# ---------------------------------------------------------------------------
# Matrix-profile discord over the daily series
# ---------------------------------------------------------------------------


def _daily_counts(sf_dir: str) -> pd.DataFrame:
    """(event_type, day_us, n_sum) via one bucketed exchange."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        day = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
        ) * DAY_US
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "day_us": day,
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["event_type", "day_us"], sort=False)
            .sum()
            .reset_index()
        )

    return hash_bucket_aggregate(
        _events(sf_dir, ["event_type", "ts"]).map_batches(
            partial, batch_format="pandas"
        ),
        ["event_type", "day_us"],
        [("n", "sum")],
    ).to_pandas()


def q_discord_daily(sf_dir: str, m: int = DISCORD_M):
    """Matrix-profile discord per event type: over the zero-filled dense
    daily count series, the length-m subsequence whose nearest non-trivial
    neighbour (|i - j| >= m exclusion zone) is FARTHEST — the "most
    anomalous week" report anomaly miners open with (Yeh et al., the
    matrix profile; brute-force exact here since the profile is
    retention-bounded). Distances are exact integer squared Euclidean;
    the discord breaks ties (mp DESC, start index ASC)."""
    agg = _daily_counts(sf_dir)
    lo = int(agg["day_us"].min())
    hi = int(agg["day_us"].max())
    grid = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    n_days = int(grid.size)
    k = n_days - m + 1
    if k < m + 1:  # no pair clears the exclusion zone
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "discord_day": pd.Series([], dtype="datetime64[us]"),
                "mp_dist": pd.Series([], dtype=np.int64),
                "n_days": pd.Series([], dtype=np.int64),
            }
        )
    rows = []
    for t in sorted(agg["event_type"].unique()):
        g = agg[agg["event_type"] == t]
        v = np.zeros(n_days, dtype=np.int64)
        v[(g["day_us"].to_numpy(np.int64) - lo) // DAY_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
        win = np.lib.stride_tricks.sliding_window_view(v, m)  # (k, m)
        diff = win[:, None, :] - win[None, :, :]
        dist = (diff * diff).sum(axis=2)  # exact int64 squared distances
        ii, jj = np.indices((k, k))
        dist = np.where(np.abs(ii - jj) >= m, dist, np.iinfo(np.int64).max)
        mp = dist.min(axis=1)
        idx = int(np.argmax(mp))  # first max = lowest start index
        rows.append((t, int(grid[idx]), int(mp[idx]), n_days))
    out = pd.DataFrame(
        rows, columns=["event_type", "day_us", "mp_dist", "n_days"]
    )
    out["discord_day"] = out["day_us"].astype("datetime64[us]")
    return out.drop(columns=["day_us"]).astype(
        {"mp_dist": np.int64, "n_days": np.int64}
    )


ORACLES120["discord_daily"] = f"""
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
params AS (SELECT COUNT(*) AS n_days FROM grid),
sub AS (
  SELECT event_type, idx AS i FROM dense, params
  WHERE idx <= n_days - {DISCORD_M}
),
offs AS (SELECT unnest(generate_series(0, {DISCORD_M - 1})) AS o),
pd AS (
  SELECT s1.event_type, s1.i AS i, s2.i AS j,
         SUM((a.x - b.x) * (a.x - b.x)) AS dist
  FROM sub s1
  JOIN sub s2 ON s2.event_type = s1.event_type
             AND abs(s1.i - s2.i) >= {DISCORD_M}
  CROSS JOIN offs o
  JOIN dense a ON a.event_type = s1.event_type AND a.idx = s1.i + o.o
  JOIN dense b ON b.event_type = s1.event_type AND b.idx = s2.i + o.o
  GROUP BY 1, 2, 3
),
mp AS (SELECT event_type, i, MIN(dist) AS mp FROM pd GROUP BY 1, 2),
top AS (
  SELECT event_type, i, mp,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY mp DESC, i ASC) AS r
  FROM mp
)
SELECT t.event_type, dn.bd AS discord_day, CAST(t.mp AS BIGINT) AS mp_dist,
       CAST(p.n_days AS BIGINT) AS n_days
FROM top t
JOIN dense dn ON dn.event_type = t.event_type AND dn.idx = t.i
CROSS JOIN params p
WHERE t.r = 1
"""


# ---------------------------------------------------------------------------
# Welch's unequal-variance t-test, weekend vs weekday
# ---------------------------------------------------------------------------


def q_welch_ttest_weekend(sf_dir: str):
    """Welch's t per event_type for weekend vs weekday event values
    (exact centivalues): t = (m1 - m0)/sqrt(v0/n0 + v1/n1) with UNBIASED
    sample variances, plus the Welch-Satterthwaite degrees of freedom —
    the heteroscedastic complement of cohens_d_weekend (which pools).
    Day-of-week is the shared (d + 3) % 7 >= 5 convention; every float
    is a transcribed expression over exact int64/HUGEINT power sums."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ts = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        wk = (((ts // DAY_US) + 3) % 7 >= 5).astype(np.int64)
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"],
                    "wk": wk,
                    "n": np.ones(len(batch), dtype=np.int64),
                    "s": c,
                    "ss": c * c,
                }
            )
            .groupby(["event_type", "wk"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "ts", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type", "wk"],
            [("n", "sum"), ("s", "sum"), ("ss", "sum")],
        )
        .to_pandas()
        .sort_values(["event_type", "wk"])
    )
    rows = []
    for et, g in agg.groupby("event_type", sort=True):
        g = g.set_index("wk")
        if 0 not in g.index or 1 not in g.index:
            continue
        n0, s0, ss0 = (int(g.loc[0, c]) for c in ["n_sum", "s_sum", "ss_sum"])
        n1, s1, ss1 = (int(g.loc[1, c]) for c in ["n_sum", "s_sum", "ss_sum"])
        if n0 < 2 or n1 < 2:
            continue
        m0 = float(s0) / float(n0)
        m1 = float(s1) / float(n1)
        v0 = (float(ss0) - float(s0) * float(s0) / float(n0)) / float(n0 - 1)
        v1 = (float(ss1) - float(s1) * float(s1) / float(n1)) / float(n1 - 1)
        a = v0 / float(n0)
        b = v1 / float(n1)
        if a + b <= 0.0:
            continue
        t = (m1 - m0) / math.sqrt(a + b)
        df = (a + b) * (a + b) / (
            a * a / float(n0 - 1) + b * b / float(n1 - 1)
        )
        rows.append(
            (et, n0, n1, float(_r6away(t)), float(_r6away(df)))
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_weekday", "n_weekend", "t_welch", "df_welch"],
    ).astype({"n_weekday": np.int64, "n_weekend": np.int64})


ORACLES120["welch_ttest_weekend"] = """
WITH b AS (
  SELECT event_type,
         CASE WHEN (epoch_us(ts) // 86400000000 + 3) % 7 >= 5
              THEN 1 ELSE 0 END AS wk,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
g AS (
  SELECT event_type, wk, COUNT(*) AS n, CAST(SUM(c) AS BIGINT) AS s,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ss
  FROM b GROUP BY 1, 2
),
w AS (
  SELECT g0.event_type,
         g0.n AS n0, g0.s AS s0, g0.ss AS ss0,
         g1.n AS n1, g1.s AS s1, g1.ss AS ss1
  FROM g g0 JOIN g g1
    ON g1.event_type = g0.event_type AND g0.wk = 0 AND g1.wk = 1
  WHERE g0.n >= 2 AND g1.n >= 2
),
f AS (
  SELECT event_type, n0, n1,
         CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS m0,
         CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
         ((CAST(ss0 AS DOUBLE)
           - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE))
          / CAST(n0 - 1 AS DOUBLE)) / CAST(n0 AS DOUBLE) AS a,
         ((CAST(ss1 AS DOUBLE)
           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
          / CAST(n1 - 1 AS DOUBLE)) / CAST(n1 AS DOUBLE) AS b
  FROM w
)
SELECT event_type,
       CAST(n0 AS BIGINT) AS n_weekday,
       CAST(n1 AS BIGINT) AS n_weekend,
       ROUND((m1 - m0) / sqrt(a + b), 6) AS t_welch,
       ROUND((a + b) * (a + b)
             / (a * a / CAST(n0 - 1 AS DOUBLE)
                + b * b / CAST(n1 - 1 AS DOUBLE)), 6) AS df_welch
FROM f
WHERE a + b > 0
"""


QUERIES120["slo_burn_rate"] = q_slo_burn_rate
QUERIES120["shewhart_violations"] = q_shewhart_violations
QUERIES120["discord_daily"] = q_discord_daily
QUERIES120["welch_ttest_weekend"] = q_welch_ttest_weekend
