"""Round-4 batch 140: directed information flow — transfer entropy
between the two busiest event streams in BOTH directions (does X's load
state help predict Y's next state beyond Y's own history — the
asymmetric, model-free causality screen Granger regression cannot give
for binary states), over median-split states of the dense hourly grid.

House parity: the state threshold is the exact nearest-rank median of
each type's dense-grid counts (integer, the co_exceedance convention);
all 8 joint (x_t, y_t, y_{t+1}) cells and every marginal are exact
integer counts; TE folds p * ln(p(y'|y,x)/p(y'|y)) over ascending
(x, y, y') cell order with counts-only ratios inside the logs (zero
cells skipped on both sides, stated).

Scale contracts: one bucketed hourly exchange; the 8-cell fold is
O(1)."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries6 import HOUR_US, _hourly_counts

QUERIES140: dict = {}
ORACLES140: dict = {}


def q_transfer_entropy(sf_dir: str):
    """Transfer entropy (nats) between the two busiest event types
    ((total DESC, type ASC)), states = hourly count > the type's own
    nearest-rank dense-grid median: TE_{X->Y} = sum over (x, y, y') of
    p(x,y,y') * ln( c(x,y,y') * c(y) / (c(x,y) * c(y,y')) ), folded in
    ascending cell order — and the reverse direction, whose asymmetry
    is the directionality signal."""
    agg = _hourly_counts(sf_dir)
    totals = (
        agg.groupby("event_type")["n_sum"]
        .sum()
        .reset_index()
        .sort_values(["n_sum", "event_type"], ascending=[False, True])
    )
    if len(totals) < 2:
        return pd.DataFrame(
            {
                "type_x": pd.Series([], dtype=object),
                "type_y": pd.Series([], dtype=object),
                "n_transitions": pd.Series([], dtype=np.int64),
                "te_x_to_y": pd.Series([], dtype=np.float64),
                "te_y_to_x": pd.Series([], dtype=np.float64),
            }
        )
    tx, ty = totals["event_type"].iloc[0], totals["event_type"].iloc[1]
    lo = int(agg["hour_us"].min())
    hi = int(agg["hour_us"].max())
    grid_n = (hi - lo) // HOUR_US + 1

    def dense_state(t: str) -> np.ndarray:
        g = agg[agg["event_type"] == t]
        v = np.zeros(grid_n, dtype=np.int64)
        v[(g["hour_us"].to_numpy(np.int64) - lo) // HOUR_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
        srt = np.sort(v)
        med = int(srt[(50 * grid_n + 99) // 100 - 1])
        return (v > med).astype(np.int64)

    sx = dense_state(tx)
    sy = dense_state(ty)
    n = grid_n - 1  # transitions

    def te(src: np.ndarray, dst: np.ndarray) -> float:
        # joint counts over (x_t, y_t, y_{t+1})
        c_xyz = np.zeros((2, 2, 2), dtype=np.int64)
        for i in range(n):
            c_xyz[src[i], dst[i], dst[i + 1]] += 1
        c_xy = c_xyz.sum(axis=2)
        c_yz = c_xyz.sum(axis=0)
        c_y = c_xyz.sum(axis=(0, 2))
        out = 0.0
        for x in range(2):  # ascending (x, y, y') fold
            for y in range(2):
                for z in range(2):
                    cj = int(c_xyz[x, y, z])
                    if cj == 0 or c_xy[x, y] == 0 or c_yz[y, z] == 0:
                        continue
                    out = out + (float(cj) / float(n)) * math.log(
                        float(cj)
                        * float(int(c_y[y]))
                        / (float(int(c_xy[x, y])) * float(int(c_yz[y, z])))
                    )
        return out

    return pd.DataFrame(
        {
            "type_x": [tx],
            "type_y": [ty],
            "n_transitions": np.array([n], dtype=np.int64),
            "te_x_to_y": [float(_r6away(te(sx, sy)))],
            "te_y_to_x": [float(_r6away(te(sy, sx)))],
        }
    )


ORACLES140["transfer_entropy"] = """
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
  SELECT p.event_type, p.r, g.bh,
         CAST(ROW_NUMBER() OVER (PARTITION BY p.event_type ORDER BY g.bh) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM (SELECT * FROM pick WHERE r <= 2) p
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = p.event_type AND h.bh = g.bh
),
ranked AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x) AS rn
  FROM dense
),
tgt AS (SELECT (50 * COUNT(*) + 99) // 100 AS target FROM grid),
med AS (
  SELECT r.event_type, MIN(r.x) AS m
  FROM ranked r CROSS JOIN tgt
  WHERE r.rn = tgt.target
  GROUP BY 1
),
st AS (
  SELECT d.r, d.idx,
         CASE WHEN d.x > med.m THEN 1 ELSE 0 END AS s
  FROM dense d JOIN med ON med.event_type = d.event_type
),
tri AS (
  SELECT a.idx, a.s AS x1, b.s AS y1, c.s AS y2
  FROM st a
  JOIN st b ON b.r = 2 AND b.idx = a.idx
  JOIN st c ON c.r = 2 AND c.idx = a.idx + 1
  WHERE a.r = 1
),
trir AS (
  SELECT a.idx, a.s AS x1, b.s AS y1, c.s AS y2
  FROM st a
  JOIN st b ON b.r = 1 AND b.idx = a.idx
  JOIN st c ON c.r = 1 AND c.idx = a.idx + 1
  WHERE a.r = 2
),
names AS (
  SELECT MAX(CASE WHEN r = 1 THEN event_type END) AS tx,
         MAX(CASE WHEN r = 2 THEN event_type END) AS ty
  FROM pick WHERE r <= 2
),
cells AS (
  SELECT x1, y1, y2, COUNT(*) AS c FROM tri GROUP BY 1, 2, 3
),
cellsr AS (
  SELECT x1, y1, y2, COUNT(*) AS c FROM trir GROUP BY 1, 2, 3
),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tri),
terms AS (
  SELECT c.x1, c.y1, c.y2,
         (CAST(c.c AS DOUBLE) / CAST(nn.n AS DOUBLE))
           * ln(CAST(c.c AS DOUBLE)
                * CAST((SELECT SUM(c2.c) FROM cells c2
                        WHERE c2.y1 = c.y1) AS DOUBLE)
                / (CAST((SELECT SUM(c3.c) FROM cells c3
                         WHERE c3.x1 = c.x1 AND c3.y1 = c.y1) AS DOUBLE)
                   * CAST((SELECT SUM(c4.c) FROM cells c4
                           WHERE c4.y1 = c.y1 AND c4.y2 = c.y2) AS DOUBLE)))
           AS term
  FROM cells c CROSS JOIN nn
),
termsr AS (
  SELECT c.x1, c.y1, c.y2,
         (CAST(c.c AS DOUBLE) / CAST(nn.n AS DOUBLE))
           * ln(CAST(c.c AS DOUBLE)
                * CAST((SELECT SUM(c2.c) FROM cellsr c2
                        WHERE c2.y1 = c.y1) AS DOUBLE)
                / (CAST((SELECT SUM(c3.c) FROM cellsr c3
                         WHERE c3.x1 = c.x1 AND c3.y1 = c.y1) AS DOUBLE)
                   * CAST((SELECT SUM(c4.c) FROM cellsr c4
                           WHERE c4.y1 = c.y1 AND c4.y2 = c.y2) AS DOUBLE)))
           AS term
  FROM cellsr c CROSS JOIN nn
)
SELECT names.tx AS type_x, names.ty AS type_y,
       nn.n AS n_transitions,
       ROUND((SELECT list_sum(list(term ORDER BY x1, y1, y2)) FROM terms), 6)
         AS te_x_to_y,
       ROUND((SELECT list_sum(list(term ORDER BY x1, y1, y2)) FROM termsr), 6)
         AS te_y_to_x
FROM names CROSS JOIN nn
"""


QUERIES140["transfer_entropy"] = q_transfer_entropy
