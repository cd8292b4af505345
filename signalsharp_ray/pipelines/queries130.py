"""Round-4 batch 130: frequency-domain and roughness diagnostics — a
candidate-period periodogram with Fisher's g concentration statistic
(which cycle dominates the load, and is it significant-looking), Theil's
U1 forecast-quality ratio for the naive forecaster (the scale-free
skill score), and the empirical variogram at dyadic lags (the
roughness/memory profile geostatisticians read).

House parity: periodogram terms are x_t * cos/sin(2*pi*t*f) with
math.cos/math.sin == DuckDB cos/sin (same libm, the established
ln/exp contract), folded in ascending grid order via list_sum; Theil's
U and the variogram are built ENTIRELY from exact integer sums (squared
counts and squared lag differences), each with one transcribed float
expression; the dominant period breaks ties (ROUND(power,6) DESC,
period ASC) — the bm25 deterministic-ranking contract.

Scale contracts: hourly counts reduce through one exchange; every fold
runs over the retention-bounded dense profile."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries6 import _hourly_counts
from .queries8 import _dense_by_type
from .queries14 import _fold

QUERIES130: dict = {}
ORACLES130: dict = {}

PERIODS = (6, 8, 12, 24, 48, 168)  # candidate cycles, hours
VARIO_LAGS = (1, 2, 4, 8, 24)


# ---------------------------------------------------------------------------
# Candidate-period periodogram + Fisher's g
# ---------------------------------------------------------------------------


def q_periodogram(sf_dir: str):
    """Per (event_type, candidate period p in {6,8,12,24,48,168} hours):
    the DFT power at frequency 1/p over the dense hourly count series —
    P = C^2 + S^2 with C = sum x_t cos(2 pi t / p), S likewise with sin
    — plus Fisher's g = P / sum(P over candidates) and a dominant flag
    ((ROUND(power,6) DESC, period ASC) ranking). The classic "is this
    stream daily or weekly" detector."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    rows = []
    for ti, t in enumerate(types):
        v = mat[ti]
        powers = []
        for p in PERIODS:
            c = 0.0
            s = 0.0
            for i in range(n):  # ascending fold, transcribed op order
                x = float(v[i])
                ang = 2.0 * math.pi * float(i) / float(p)
                c = c + x * math.cos(ang)
                s = s + x * math.sin(ang)
            powers.append(c * c + s * s)
        tot = _fold(powers)
        ranked = sorted(
            range(len(PERIODS)),
            key=lambda j: (-float(_r6away(powers[j])), PERIODS[j]),
        )
        dom = ranked[0]
        for j, p in enumerate(PERIODS):
            rows.append(
                (
                    t,
                    p,
                    float(_r6away(powers[j])),
                    float(_r6away(powers[j] / tot)) if tot > 0 else 0.0,
                    1 if j == dom else 0,
                )
            )
    return pd.DataFrame(
        rows,
        columns=["event_type", "period_h", "power", "fisher_g", "dominant"],
    ).astype({"period_h": np.int64, "dominant": np.int64})


_PERIOD_VALUES = ", ".join(f"({p})" for p in PERIODS)

ORACLES130["periodogram"] = f"""
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
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
periods AS (SELECT * FROM (VALUES {_PERIOD_VALUES}) pr(p)),
cs AS (
  SELECT d.event_type, pr.p,
         list_sum(list(CAST(d.x AS DOUBLE)
                       * cos(CAST(2.0 AS DOUBLE) * pi() * CAST(d.idx AS DOUBLE)
                             / CAST(pr.p AS DOUBLE))
                       ORDER BY d.idx)) AS c,
         list_sum(list(CAST(d.x AS DOUBLE)
                       * sin(CAST(2.0 AS DOUBLE) * pi() * CAST(d.idx AS DOUBLE)
                             / CAST(pr.p AS DOUBLE))
                       ORDER BY d.idx)) AS s
  FROM dense d CROSS JOIN periods pr
  GROUP BY 1, 2
),
pw AS (
  SELECT event_type, p, c * c + s * s AS power
  FROM cs
),
tot AS (
  SELECT event_type,
         list_sum(list(power ORDER BY p)) AS total
  FROM pw GROUP BY 1
),
rk AS (
  SELECT event_type, p,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY ROUND(power, 6) DESC, p ASC) AS r
  FROM pw
)
SELECT pw.event_type, CAST(pw.p AS BIGINT) AS period_h,
       ROUND(pw.power, 6) AS power,
       ROUND(CASE WHEN tot.total > 0 THEN pw.power / tot.total
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS fisher_g,
       CAST(CASE WHEN rk.r = 1 THEN 1 ELSE 0 END AS BIGINT) AS dominant
FROM pw
JOIN tot USING (event_type)
JOIN rk ON rk.event_type = pw.event_type AND rk.p = pw.p
"""


# ---------------------------------------------------------------------------
# Theil's U1 for the naive forecaster
# ---------------------------------------------------------------------------


def q_theils_u(sf_dir: str):
    """Per event_type: Theil's U1 for the naive one-step forecast
    (y_hat_t = y_{t-1}) over the dense hourly grid —
    U1 = sqrt(E/n) / (sqrt(A/n) + sqrt(F/n)) with E = sum (y_t -
    y_{t-1})^2, A = sum y_t^2, F = sum y_{t-1}^2, all EXACT integers
    (0 = perfect, 1 = useless). Types whose denominator is zero are
    excluded on both sides."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n_grid = int(grid.size)
    if n_grid < 2:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_pairs": pd.Series([], dtype=np.int64),
                "theil_u1": pd.Series([], dtype=np.float64),
            }
        )
    rows = []
    for ti, t in enumerate(types):
        v = mat[ti]
        cur, prev = v[1:], v[:-1]
        e = int(((cur - prev) ** 2).sum())
        a = int((cur * cur).sum())
        f = int((prev * prev).sum())
        m = n_grid - 1
        denom = math.sqrt(float(a) / float(m)) + math.sqrt(
            float(f) / float(m)
        )
        if denom <= 0.0:
            continue
        u1 = math.sqrt(float(e) / float(m)) / denom
        rows.append((t, m, float(_r6away(u1))))
    return pd.DataFrame(
        rows, columns=["event_type", "n_pairs", "theil_u1"]
    ).astype({"n_pairs": np.int64})


ORACLES130["theils_u"] = """
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
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
s AS (
  SELECT a.event_type, COUNT(*) AS m,
         CAST(SUM((a.x - p.x) * (a.x - p.x)) AS BIGINT) AS e,
         CAST(SUM(a.x * a.x) AS BIGINT) AS aa,
         CAST(SUM(p.x * p.x) AS BIGINT) AS ff
  FROM dense a
  JOIN dense p ON p.event_type = a.event_type AND p.idx = a.idx - 1
  GROUP BY 1
)
SELECT event_type, CAST(m AS BIGINT) AS n_pairs,
       ROUND(sqrt(CAST(e AS DOUBLE) / CAST(m AS DOUBLE))
             / (sqrt(CAST(aa AS DOUBLE) / CAST(m AS DOUBLE))
                + sqrt(CAST(ff AS DOUBLE) / CAST(m AS DOUBLE))), 6)
         AS theil_u1
FROM s
WHERE sqrt(CAST(aa AS DOUBLE) / CAST(m AS DOUBLE))
      + sqrt(CAST(ff AS DOUBLE) / CAST(m AS DOUBLE)) > 0
"""


# ---------------------------------------------------------------------------
# Empirical variogram
# ---------------------------------------------------------------------------


def q_variogram(sf_dir: str):
    """Per (event_type, lag h in {1,2,4,8,24} hours): the empirical
    semivariogram gamma(h) = sum (y_{t+h} - y_t)^2 / (2 * n_pairs) over
    the dense grid — the roughness-vs-memory profile (a sill that rises
    to 24 then flattens = daily-cycle memory). Squared-difference sums
    are exact integers; gamma is one shared division."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    rows = []
    for ti, t in enumerate(types):
        v = mat[ti]
        for h in VARIO_LAGS:
            if n <= h:
                continue
            d = v[h:] - v[:-h]
            ss = int((d * d).sum())
            m = n - h
            rows.append(
                (
                    t,
                    h,
                    m,
                    ss,
                    float(_r6away(float(ss) / (2.0 * float(m)))),
                )
            )
    return pd.DataFrame(
        rows, columns=["event_type", "lag_h", "n_pairs", "ss", "gamma"]
    ).astype({"lag_h": np.int64, "n_pairs": np.int64, "ss": np.int64})


_LAG_VALUES = ", ".join(f"({h})" for h in VARIO_LAGS)

ORACLES130["semivariogram"] = f"""
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
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
lags AS (SELECT * FROM (VALUES {_LAG_VALUES}) lg(lag)),
s AS (
  SELECT a.event_type, lg.lag, COUNT(*) AS m,
         CAST(SUM((b.x - a.x) * (b.x - a.x)) AS BIGINT) AS ss
  FROM dense a
  CROSS JOIN lags lg
  JOIN dense b ON b.event_type = a.event_type AND b.idx = a.idx + lg.lag
  GROUP BY 1, 2
)
SELECT event_type, CAST(lag AS BIGINT) AS lag_h, CAST(m AS BIGINT) AS n_pairs,
       ss,
       ROUND(CAST(ss AS DOUBLE) / (CAST(2.0 AS DOUBLE) * CAST(m AS DOUBLE)), 6)
         AS gamma
FROM s
"""


QUERIES130["periodogram"] = q_periodogram
QUERIES130["theils_u"] = q_theils_u
QUERIES130["semivariogram"] = q_variogram
