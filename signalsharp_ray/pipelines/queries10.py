"""Round-3 batch 12: signal-processing statistics over the hourly event
grid — unnormalized Haar wavelet detail energy (multi-resolution
burstiness), Goertzel diurnal spectral power (the single-bin DFT the
reference's seasonality tooling would motivate), intraday ramp rates, and
mean-crossing rates.

House parity: the Haar transform stays in EXACT integers at every level
(unnormalized lifting: a = x0 + x1, d = x0 - x1 — no halving, so no
floats until the final energy is already an int64); Goertzel is a
two-state float recursion transcribed op-for-op against a recursive CTE
with the 2·cos(π/12) constant embedded as the SAME decimal literal on
both engines (the Kalman/EMA contract); crossing detection multiplies
out the mean (n·v - S) so sign tests are pure integer.

Scale contracts: everything here consumes the catalog-x-retention-bounded
hourly count table (one bucketed exchange over per-batch partials); the
per-type recursions are bounded by retention hours, never event volume.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries6 import _hourly_counts
from .queries8 import _dense_by_type

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000

# 2*cos(pi/12 rad) == 2*cos(2*pi/24): the diurnal Goertzel coefficient,
# embedded as the same decimal literal in the SQL oracle so both engines
# parse the identical double
GOERTZEL_C = 1.9318516525781366

QUERIES10: dict = {}
ORACLES10: dict = {}


# ---------------------------------------------------------------------------
# Unnormalized Haar wavelet detail energy, levels 1..3
# ---------------------------------------------------------------------------


def haar_energy_series(v: np.ndarray, levels: int = 3):
    """[(level, n_pairs, energy)] — unnormalized Haar lifting on an int64
    series: a = x0 + x1 (carried up), d = x0 - x1 (detail); energy_L =
    sum(d²) at level L. Exact integers throughout; a trailing odd element
    is dropped at each level (standard dyadic truncation)."""
    x = np.asarray(v, dtype=np.int64)
    out = []
    for lvl in range(1, levels + 1):
        m = x.size // 2
        if m == 0:
            break
        d = x[0 : 2 * m : 2] - x[1 : 2 * m : 2]
        out.append((lvl, m, int(np.sum(d * d))))
        x = x[0 : 2 * m : 2] + x[1 : 2 * m : 2]
    return out


def q_haar_energy(sf_dir: str):
    """Per event type: Haar detail energy at dyadic scales 2h/4h/8h over
    the dense hourly count grid — the multi-resolution burstiness
    decomposition (high level-1 energy = hour-to-hour jitter; energy
    migrating to level 3 = slow regime swings). Integer-exact."""
    types, _grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        for lvl, m, e in haar_energy_series(mat[i]):
            rows.append((t, lvl, m, e))
    return pd.DataFrame(
        rows, columns=["event_type", "level", "n_pairs", "energy"]
    ).astype({"level": np.int64, "n_pairs": np.int64, "energy": np.int64})


_HAAR_LEVEL = """
p{L} AS (
  SELECT event_type, (rn - 1) // 2 AS g,
         SUM(CASE WHEN rn % 2 = 1 THEN v ELSE -v END) AS d,
         SUM(v) AS a, COUNT(*) AS c
  FROM l{P} GROUP BY 1, 2
  HAVING COUNT(*) = 2
),
l{L} AS (
  SELECT event_type,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY g) AS rn,
         a AS v
  FROM p{L}
),
e{L} AS (
  SELECT event_type, CAST({L} AS BIGINT) AS level,
         COUNT(*) AS n_pairs, CAST(SUM(d * d) AS BIGINT) AS energy
  FROM p{L} GROUP BY 1
)"""

ORACLES10["haar_energy"] = (
    """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
l0 AS (
  SELECT t.event_type,
         ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) AS rn,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS v
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),"""
    + _HAAR_LEVEL.format(L=1, P=0)
    + ","
    + _HAAR_LEVEL.format(L=2, P=1)
    + ","
    + _HAAR_LEVEL.format(L=3, P=2)
    + """
SELECT * FROM e1 UNION ALL SELECT * FROM e2 UNION ALL SELECT * FROM e3
"""
)


# ---------------------------------------------------------------------------
# Goertzel power at the 24-hour period
# ---------------------------------------------------------------------------


def goertzel_power(v: np.ndarray, c: float = GOERTZEL_C) -> float:
    """Two-state Goertzel recursion s_t = x_t + c*s1 - s2 over the series,
    returning s1² + s2² - c*s1*s2 — the spectral power at the period
    encoded by c = 2·cos(2π/period)."""
    s1 = 0.0
    s2 = 0.0
    for x in v:
        s = float(x) + c * s1 - s2
        s2 = s1
        s1 = s
    return s1 * s1 + s2 * s2 - c * s1 * s2


def q_goertzel_diurnal(sf_dir: str):
    """Per event type: Goertzel spectral power at the 24-hour period over
    the dense hourly count grid — the one-bin DFT that quantifies HOW
    diurnal a stream is (chi2_hour_of_day tests the profile;
    seasonal_strength scores variance explained; this measures the
    sinusoidal component directly). Float recursion, bitwise-transcribed
    against a recursive-CTE oracle."""
    types, _grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        p = goertzel_power(v)
        rows.append((t, int(v.size), float(_r6away(p))))
    out = pd.DataFrame(rows, columns=["event_type", "n", "power"])
    return out.astype({"n": np.int64})


ORACLES10["goertzel_diurnal"] = f"""
WITH RECURSIVE h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
base AS MATERIALIZED (
  SELECT t.event_type,
         ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1 AS idx,
         CAST(COALESCE(h.n, 0) AS DOUBLE) AS v
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
mx AS (SELECT event_type, MAX(idx) AS mx FROM base GROUP BY 1),
go AS (
  SELECT event_type, CAST(-1 AS BIGINT) AS idx,
         CAST(0.0 AS DOUBLE) AS s1, CAST(0.0 AS DOUBLE) AS s2
  FROM mx
  UNION ALL
  SELECT b.event_type, b.idx,
         b.v + {GOERTZEL_C!r} * go.s1 - go.s2 AS s1,
         go.s1 AS s2
  FROM go JOIN base b ON b.event_type = go.event_type AND b.idx = go.idx + 1
)
SELECT go.event_type, CAST(m.mx + 1 AS BIGINT) AS n,
       ROUND(go.s1 * go.s1 + go.s2 * go.s2
             - {GOERTZEL_C!r} * go.s1 * go.s2, 6) AS power
FROM go JOIN mx m ON m.event_type = go.event_type AND go.idx = m.mx
"""


# ---------------------------------------------------------------------------
# Intraday ramp rate
# ---------------------------------------------------------------------------


def q_intraday_ramp(sf_dir: str):
    """Per (event type, day): the steepest hour-over-hour count change
    within the day (max ramp) and how many transitions rose — capacity
    planning's 'how fast does load arrive' table. Day boundaries never
    pair with the previous day; pure integers."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    day = grid // DAY_US
    same_day = day[1:] == day[:-1]
    rows = []
    for i, t in enumerate(types):
        d = np.diff(mat[i])
        df = pd.DataFrame(
            {"day_us": day[1:][same_day] * DAY_US, "d": d[same_day]}
        )
        g = df.groupby("day_us", sort=True).agg(
            max_ramp=("d", "max"), n_up=("d", lambda s: int((s > 0).sum()))
        )
        g["event_type"] = t
        rows.append(g.reset_index())
    out = pd.concat(rows, ignore_index=True)
    return out[["event_type", "day_us", "max_ramp", "n_up"]].astype(
        {"day_us": np.int64, "max_ramp": np.int64, "n_up": np.int64}
    )


ORACLES10["intraday_ramp"] = """
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
         n - LAG(n) OVER (PARTITION BY event_type ORDER BY bh) AS diff,
         date_trunc('day', bh)
           = date_trunc('day', LAG(bh) OVER (PARTITION BY event_type ORDER BY bh))
           AS same_day
  FROM dense
  QUALIFY diff IS NOT NULL AND same_day
)
SELECT event_type,
       CAST(epoch_us(date_trunc('day', bh)) AS BIGINT) AS day_us,
       CAST(MAX(diff) AS BIGINT) AS max_ramp,
       CAST(SUM(CASE WHEN diff > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_up
FROM d GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Mean-crossing rate
# ---------------------------------------------------------------------------


def q_mean_crossing_rate(sf_dir: str):
    """Per event type: how many times the hourly count series crosses its
    own mean (strict sign flips of n·v - S; the mean is multiplied out so
    the test is exact integer), plus exact-mean touches — the oscillation-
    frequency statistic distinguishing noise from level shifts."""
    types, _grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        n = v.size
        S = int(v.sum())
        c = n * v - S
        crossings = int(np.sum(c[:-1] * c[1:] < 0))
        touches = int(np.sum(c == 0))
        rows.append((t, n, crossings, touches))
    return pd.DataFrame(
        rows, columns=["event_type", "n", "crossings", "touches"]
    ).astype({"n": np.int64, "crossings": np.int64, "touches": np.int64})


ORACLES10["mean_crossing_rate"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT t.event_type, g.bh, CAST(COALESCE(h.n, 0) AS BIGINT) AS v
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
tot AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s
  FROM dense GROUP BY 1
),
c AS (
  SELECT d.event_type, d.bh, t.n, t.n * d.v - t.s AS cv
  FROM dense d JOIN tot t USING (event_type)
),
w AS (
  SELECT event_type, n, cv,
         LAG(cv) OVER (PARTITION BY event_type ORDER BY bh) AS prev
  FROM c
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN prev IS NOT NULL AND cv * prev < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS crossings,
       CAST(SUM(CASE WHEN cv = 0 THEN 1 ELSE 0 END) AS BIGINT) AS touches
FROM w GROUP BY 1
"""


QUERIES10["haar_energy"] = q_haar_energy
QUERIES10["goertzel_diurnal"] = q_goertzel_diurnal
QUERIES10["intraday_ramp"] = q_intraday_ramp
QUERIES10["mean_crossing_rate"] = q_mean_crossing_rate
