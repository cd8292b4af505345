"""Round-4 batch 145: confounder-adjusted dependence — the partial
correlation between the two busiest event streams' hourly loads
CONTROLLING for the third (is the view/click co-movement real, or do
both just follow overall traffic — the question the plain correlation
matrix cannot answer).

House parity: all three pairwise Pearson correlations derive from
exact int64/HUGEINT power sums over the shared dense grid (the
rolling_corr contract); the partial-correlation combination
(r_xy - r_xz * r_yz) / sqrt((1 - r_xz^2) (1 - r_yz^2)) is one
transcribed float expression over those three doubles.

Scale contracts: one bucketed hourly exchange; the grid fold is
retention-bounded."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries6 import HOUR_US, _hourly_counts

QUERIES145: dict = {}
ORACLES145: dict = {}


def q_partial_correlation(sf_dir: str):
    """One row: the three busiest event types ((total DESC, type ASC)),
    the raw Pearson correlation between #1 and #2's dense hourly loads,
    and the partial correlation controlling for #3 — shrinkage toward 0
    means the co-movement was mostly common traffic. Excluded if any
    series has zero variance."""
    agg = _hourly_counts(sf_dir)
    totals = (
        agg.groupby("event_type")["n_sum"]
        .sum()
        .reset_index()
        .sort_values(["n_sum", "event_type"], ascending=[False, True])
    )
    empty = pd.DataFrame(
        {
            "type_x": pd.Series([], dtype=object),
            "type_y": pd.Series([], dtype=object),
            "type_z": pd.Series([], dtype=object),
            "n_hours": pd.Series([], dtype=np.int64),
            "r_xy": pd.Series([], dtype=np.float64),
            "partial_r_xy_z": pd.Series([], dtype=np.float64),
        }
    )
    if len(totals) < 3:
        return empty
    tx, ty, tz = totals["event_type"].iloc[:3]
    lo = int(agg["hour_us"].min())
    hi = int(agg["hour_us"].max())
    n = (hi - lo) // HOUR_US + 1

    def dense(t: str) -> np.ndarray:
        g = agg[agg["event_type"] == t]
        v = np.zeros(n, dtype=np.int64)
        v[(g["hour_us"].to_numpy(np.int64) - lo) // HOUR_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
        return v

    x, y, z = dense(tx), dense(ty), dense(tz)

    def corr(a: np.ndarray, b: np.ndarray):
        sa, sb = int(a.sum()), int(b.sum())
        qa = int((a * a).sum())
        qb = int((b * b).sum())
        sab = int((a * b).sum())
        va = n * qa - sa * sa
        vb = n * qb - sb * sb
        if va <= 0 or vb <= 0:
            return None
        return (float(n) * float(sab) - float(sa) * float(sb)) / math.sqrt(
            float(va) * float(vb)
        )

    r_xy = corr(x, y)
    r_xz = corr(x, z)
    r_yz = corr(y, z)
    if r_xy is None or r_xz is None or r_yz is None:
        return empty
    denom = math.sqrt((1.0 - r_xz * r_xz) * (1.0 - r_yz * r_yz))
    if denom <= 0.0:
        return empty
    pr = (r_xy - r_xz * r_yz) / denom
    return pd.DataFrame(
        {
            "type_x": [tx],
            "type_y": [ty],
            "type_z": [tz],
            "n_hours": np.array([n], dtype=np.int64),
            "r_xy": [float(_r6away(r_xy))],
            "partial_r_xy_z": [float(_r6away(pr))],
        }
    )


ORACLES145["partial_correlation"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
pick AS (
  SELECT event_type,
         ROW_NUMBER() OVER (ORDER BY SUM(n) DESC, event_type ASC) AS r
  FROM h GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT p.r, g.bh, CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM (SELECT * FROM pick WHERE r <= 3) p
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = p.event_type AND h.bh = g.bh
),
wide AS (
  SELECT g.bh,
         MAX(CASE WHEN d.r = 1 THEN d.x END) AS x,
         MAX(CASE WHEN d.r = 2 THEN d.x END) AS y,
         MAX(CASE WHEN d.r = 3 THEN d.x END) AS z
  FROM grid g JOIN dense d ON d.bh = g.bh
  GROUP BY 1
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(z) AS BIGINT) AS sz,
         CAST(SUM(x * x) AS HUGEINT) AS qx,
         CAST(SUM(y * y) AS HUGEINT) AS qy,
         CAST(SUM(z * z) AS HUGEINT) AS qz,
         CAST(SUM(x * y) AS HUGEINT) AS sxy,
         CAST(SUM(x * z) AS HUGEINT) AS sxz,
         CAST(SUM(y * z) AS HUGEINT) AS syz
  FROM wide
),
c AS (
  SELECT n,
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / sqrt(CAST(n * qx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * CAST(n * qy - CAST(sy AS HUGEINT) * sy AS DOUBLE))
           AS r_xy,
         (CAST(n AS DOUBLE) * CAST(sxz AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
           / sqrt(CAST(n * qx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                  * CAST(n * qz - CAST(sz AS HUGEINT) * sz AS DOUBLE))
           AS r_xz,
         (CAST(n AS DOUBLE) * CAST(syz AS DOUBLE)
          - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
           / sqrt(CAST(n * qy - CAST(sy AS HUGEINT) * sy AS DOUBLE)
                  * CAST(n * qz - CAST(sz AS HUGEINT) * sz AS DOUBLE))
           AS r_yz
  FROM m
  WHERE n * qx - CAST(sx AS HUGEINT) * sx > 0
    AND n * qy - CAST(sy AS HUGEINT) * sy > 0
    AND n * qz - CAST(sz AS HUGEINT) * sz > 0
),
names AS (
  SELECT MAX(CASE WHEN r = 1 THEN event_type END) AS tx,
         MAX(CASE WHEN r = 2 THEN event_type END) AS ty,
         MAX(CASE WHEN r = 3 THEN event_type END) AS tz
  FROM pick WHERE r <= 3
)
SELECT names.tx AS type_x, names.ty AS type_y, names.tz AS type_z,
       c.n AS n_hours,
       ROUND(c.r_xy, 6) AS r_xy,
       ROUND((c.r_xy - c.r_xz * c.r_yz)
             / sqrt((CAST(1.0 AS DOUBLE) - c.r_xz * c.r_xz)
                    * (CAST(1.0 AS DOUBLE) - c.r_yz * c.r_yz)), 6)
         AS partial_r_xy_z
FROM c CROSS JOIN names
WHERE sqrt((CAST(1.0 AS DOUBLE) - c.r_xz * c.r_xz)
           * (CAST(1.0 AS DOUBLE) - c.r_yz * c.r_yz)) > 0
"""


QUERIES145["partial_correlation"] = q_partial_correlation
