"""Round-3 batch 10: time-series pattern mining over the event stream —
local-maximum detection on the dense hourly grid, busy-streak islands,
hour-of-day seasonal strength (the ANOVA R² behind "is this series
diurnal enough to model seasonally?"), and up/down momentum runs.

House parity: hourly counts are exact int64 on a shared dense grid (the
rolling_corr_24h contract); value sums cross exchanges as int64
centivalues; the single float expression per output row (seasonal
strength) is transcribed op-for-op with an ascending-hour left-fold
(list_sum(list(... ORDER BY hod))) for its only multi-term float
reduction, the token_entropy trick.

Scale contracts: every per-(type, hour) / per-(type, hour-of-day) table
is bounded by catalog x retention / catalog x 24 and may sit on the
driver; the raw event stream reduces through per-batch combiners and one
bucketed exchange before anything leaves Ray.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _cents
from .queries6 import _hourly_counts

HOUR_US = 3_600_000_000

QUERIES8: dict = {}
ORACLES8: dict = {}


def _dense_by_type(agg: pd.DataFrame):
    """(types, grid, matrix[type, hour]) — zero-filled dense int64 hourly
    counts over the global [lo, hi] grid, one row per event type."""
    lo = int(agg["hour_us"].min())
    hi = int(agg["hour_us"].max())
    grid = np.arange(lo, hi + HOUR_US, HOUR_US, dtype=np.int64)
    types = sorted(agg["event_type"].unique())
    mat = np.zeros((len(types), grid.size), dtype=np.int64)
    for i, t in enumerate(types):
        g = agg[agg["event_type"] == t]
        mat[i, (g["hour_us"].to_numpy(np.int64) - lo) // HOUR_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
    return types, grid, mat


# ---------------------------------------------------------------------------
# Local maxima on the dense hourly grid
# ---------------------------------------------------------------------------


def q_hourly_peaks(sf_dir: str, min_count: int = 2):
    """Strict local maxima of each event type's zero-filled hourly count
    series: interior hours whose count exceeds BOTH neighbours and a
    noise floor — the peak-detection primitive behind burst triage
    (burst_hours thresholds against a global rate; this finds local
    shape regardless of level). Pure integer comparisons."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        mid = v[1:-1]
        pk = (mid > v[:-2]) & (mid > v[2:]) & (mid >= min_count)
        idx = np.nonzero(pk)[0] + 1
        rows.append(
            pd.DataFrame(
                {"event_type": t, "hour_us": grid[idx], "n": v[idx]}
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.astype({"hour_us": np.int64, "n": np.int64})


ORACLES8["hourly_peaks"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT t.event_type, g.bh, COALESCE(h.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
w AS (
  SELECT event_type, bh, n,
         LAG(n) OVER win AS prev, LEAD(n) OVER win AS next
  FROM dense
  WINDOW win AS (PARTITION BY event_type ORDER BY bh)
)
SELECT event_type, CAST(epoch_us(bh) AS BIGINT) AS hour_us, n
FROM w
WHERE prev IS NOT NULL AND next IS NOT NULL
  AND n > prev AND n > next AND n >= 2
"""


# ---------------------------------------------------------------------------
# Busy-streak islands (gaps-and-islands over present hours)
# ---------------------------------------------------------------------------


def q_busy_runs(sf_dir: str, min_count: int = 2):
    """Maximal runs of CONSECUTIVE hours in which an event type sustained
    at least `min_count` events — the gaps-and-islands streak report
    (start, length, volume per streak). Missing hours break a run; all
    arithmetic is integer."""
    agg = _hourly_counts(sf_dir)
    busy = agg[agg["n_sum"] >= min_count]
    rows = []
    for t, g in busy.groupby("event_type", sort=True):
        h = np.sort(g["hour_us"].to_numpy(np.int64))
        n = g.set_index("hour_us")["n_sum"].loc[h].to_numpy(np.int64)
        # island id = hour index minus rank; constant within a consecutive run
        island = h // HOUR_US - np.arange(h.size, dtype=np.int64)
        df = pd.DataFrame({"island": island, "h": h, "n": n})
        runs = df.groupby("island", sort=False).agg(
            start_us=("h", "min"), n_hours=("h", "size"), total=("n", "sum")
        )
        runs["event_type"] = t
        rows.append(runs.reset_index(drop=True))
    out = pd.concat(rows, ignore_index=True)
    return out[["event_type", "start_us", "n_hours", "total"]].astype(
        {"start_us": np.int64, "n_hours": np.int64, "total": np.int64}
    )


ORACLES8["busy_runs"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
  HAVING COUNT(*) >= 2
),
r AS (
  SELECT event_type, bh, n,
         CAST(epoch_us(bh) AS BIGINT) // 3600000000
           - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bh) AS island
  FROM h
)
SELECT event_type,
       CAST(epoch_us(MIN(bh)) AS BIGINT) AS start_us,
       COUNT(*) AS n_hours,
       CAST(SUM(n) AS BIGINT) AS total
FROM r GROUP BY event_type, island
"""


# ---------------------------------------------------------------------------
# Hour-of-day seasonal strength (ANOVA R² of the diurnal profile)
# ---------------------------------------------------------------------------


def q_seasonal_strength(sf_dir: str):
    """Per event type: the fraction of value variance explained by the
    hour-of-day profile — between-group sum of squares over total sum of
    squares, the ANOVA R² that decides whether a seasonal model (Holt-
    Winters, seasonal-naive) is worth fitting. chi2_hour_of_day asks the
    same question of COUNTS; this scores the VALUE series.

    Parity: per-(type, hod) ingredients (S_g = sum of centivalues, n_g)
    and per-type (S, n, Q = sum of squared centivalues) are exact int64
    through the exchange; the only multi-term float reduction —
    sum_g S_g²/n_g — runs as an ascending-hod left-fold on both engines;
    every remaining op is transcribed one-for-one."""
    ev = _events(sf_dir, ["ts", "event_type", "value"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        c = _cents(batch["value"])
        hod = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64)
            // HOUR_US
            % 24
        ).astype(np.int64)
        g = (
            pd.DataFrame({"event_type": batch["event_type"], "hod": hod, "s": c})
            .assign(q=c * c, n=np.int64(1))
            .groupby(["event_type", "hod"], sort=False)
            .agg(s=("s", "sum"), q=("q", "sum"), n=("n", "sum"))
        )
        return g.reset_index()

    agg = hash_bucket_aggregate(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "hod"],
        [("s", "sum"), ("q", "sum"), ("n", "sum")],
    ).to_pandas()  # catalog x 24 bounded
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        g = g.sort_values("hod")
        S = int(g["s_sum"].sum())
        n = int(g["n_sum"].sum())
        Q = int(g["q_sum"].sum())
        ssb = 0.0
        for sg, ng in zip(g["s_sum"], g["n_sum"]):  # ascending-hod left-fold
            ssb = ssb + (float(sg) * float(sg)) / float(ng)
        sbar = (float(S) * float(S)) / float(n)
        denom = float(Q) - sbar
        if denom <= 0.0:
            continue
        rows.append((t, n, _r6away((ssb - sbar) / denom)[()]))
    return pd.DataFrame(rows, columns=["event_type", "n", "strength"]).astype(
        {"n": np.int64}
    )


ORACLES8["seasonal_strength"] = """
WITH e AS (
  SELECT event_type,
         CAST(epoch_us(date_trunc('hour', ts)) AS BIGINT) // 3600000000 % 24 AS hod,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
g AS (
  SELECT event_type, hod,
         CAST(SUM(c) AS BIGINT) AS s, COUNT(*) AS ng
  FROM e GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(SUM(c) AS BIGINT) AS stot,
         CAST(SUM(c * c) AS BIGINT) AS q,
         COUNT(*) AS n
  FROM e GROUP BY 1
),
b AS (
  SELECT event_type,
         list_sum(list(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(ng AS DOUBLE)
                       ORDER BY hod)) AS ssb
  FROM g GROUP BY 1
)
SELECT t.event_type, t.n,
       ROUND((b.ssb - CAST(t.stot AS DOUBLE) * CAST(t.stot AS DOUBLE) / CAST(t.n AS DOUBLE))
             / (CAST(t.q AS DOUBLE)
                - CAST(t.stot AS DOUBLE) * CAST(t.stot AS DOUBLE) / CAST(t.n AS DOUBLE)),
             6) AS strength
FROM tot t JOIN b USING (event_type)
WHERE CAST(t.q AS DOUBLE)
      - CAST(t.stot AS DOUBLE) * CAST(t.stot AS DOUBLE) / CAST(t.n AS DOUBLE) > 0
"""


# ---------------------------------------------------------------------------
# Momentum runs (up/down/flat transitions on the dense hourly grid)
# ---------------------------------------------------------------------------


def q_momentum_runs(sf_dir: str):
    """Per event type over the dense hourly grid: how many hour-to-hour
    transitions went up / down / stayed flat, and the longest strictly-
    increasing streak — the direction-of-motion summary used to pick
    trend-aware forecasters (theil_sen fits the slope; this counts the
    sign pattern). Pure integer."""
    types, _grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        d = np.diff(mat[i])
        up = d > 0
        longest = 0
        cur = 0
        for u in up:  # bounded by retention hours
            cur = cur + 1 if u else 0
            longest = max(longest, cur)
        rows.append(
            (t, int(up.sum()), int((d < 0).sum()), int((d == 0).sum()), longest)
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_up", "n_down", "n_flat", "longest_up_run"]
    ).astype({c: np.int64 for c in ["n_up", "n_down", "n_flat", "longest_up_run"]})


ORACLES8["momentum_runs"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT t.event_type, g.bh, COALESCE(h.n, 0) AS n
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
d AS (
  SELECT event_type, bh,
         n - LAG(n) OVER (PARTITION BY event_type ORDER BY bh) AS diff
  FROM dense
  QUALIFY diff IS NOT NULL
),
runs AS (
  SELECT event_type,
         CAST(epoch_us(bh) AS BIGINT) // 3600000000
           - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bh) AS island
  FROM d WHERE diff > 0
),
longest AS (
  SELECT event_type, MAX(len) AS longest_up_run FROM (
    SELECT event_type, COUNT(*) AS len FROM runs GROUP BY event_type, island
  ) GROUP BY 1
)
SELECT d.event_type,
       CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
       CAST(SUM(CASE WHEN diff < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
       CAST(SUM(CASE WHEN diff = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_flat,
       CAST(COALESCE(MAX(l.longest_up_run), 0) AS BIGINT) AS longest_up_run
FROM d LEFT JOIN longest l USING (event_type)
GROUP BY 1
"""


QUERIES8["hourly_peaks"] = q_hourly_peaks
QUERIES8["busy_runs"] = q_busy_runs
QUERIES8["seasonal_strength"] = q_seasonal_strength
QUERIES8["momentum_runs"] = q_momentum_runs
