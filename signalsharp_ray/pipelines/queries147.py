"""Round-4 batch 147: L-moments of the hourly load — the
order-statistic alternative to classical moments (Hosking): l1 (mean),
l2 (L-scale), and the bounded ratios t3 = L-skewness and t4 = L-kurtosis
that stay finite and robust where G1/kurtosis explode on heavy tails —
the distribution summary hydrologists and SRE capacity planners fit
extreme-value models from.

House parity: the probability-weighted-moment numerators
sum (i-1)(i-2)...(i-k) * x_(i) over ascending ranks are EXACT integers
(ties are rank-sum invariant because tied values are equal); every
b_k, l_k and ratio is a transcribed float expression over those
integers.

Scale contracts: one bucketed hourly exchange; per-type sorts fold the
retention-bounded dense profile."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries6 import _hourly_counts
from .queries8 import _dense_by_type

QUERIES147: dict = {}
ORACLES147: dict = {}


def q_l_moments(sf_dir: str):
    """Per event_type over the SORTED dense hourly counts x_(1..n):
    probability-weighted moments b0..b3 with exact integer numerators
    (sum of falling-factorial rank weights times x), then l1 = b0,
    l2 = 2b1 - b0, l3 = 6b2 - 6b1 + b0, l4 = 20b3 - 30b2 + 12b1 - b0,
    and the ratios t3 = l3/l2, t4 = l4/l2 (types with l2 = 0 are
    excluded). |t3| <= 1 always — the bounded skewness."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    if n < 4:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_hours": pd.Series([], dtype=np.int64),
                "l1": pd.Series([], dtype=np.float64),
                "l2": pd.Series([], dtype=np.float64),
                "t3": pd.Series([], dtype=np.float64),
                "t4": pd.Series([], dtype=np.float64),
            }
        )
    rows = []
    for ti, t in enumerate(types):
        x = np.sort(mat[ti]).astype(object)
        i = np.arange(1, n + 1, dtype=object)
        s0 = int(sum(x))
        s1 = int(sum((ii - 1) * xx for ii, xx in zip(i, x)))
        s2 = int(sum((ii - 1) * (ii - 2) * xx for ii, xx in zip(i, x)))
        s3 = int(
            sum((ii - 1) * (ii - 2) * (ii - 3) * xx for ii, xx in zip(i, x))
        )
        b0 = float(s0) / float(n)
        b1 = float(s1) / (float(n) * float(n - 1))
        b2 = float(s2) / (float(n) * float(n - 1) * float(n - 2))
        b3 = float(s3) / (
            float(n) * float(n - 1) * float(n - 2) * float(n - 3)
        )
        l1 = b0
        l2 = 2.0 * b1 - b0
        l3 = 6.0 * b2 - 6.0 * b1 + b0
        l4 = 20.0 * b3 - 30.0 * b2 + 12.0 * b1 - b0
        if l2 == 0.0:
            continue
        rows.append(
            (
                t,
                n,
                float(_r6away(l1)),
                float(_r6away(l2)),
                float(_r6away(l3 / l2)),
                float(_r6away(l4 / l2)),
            )
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_hours", "l1", "l2", "t3", "t4"]
    ).astype({"n_hours": np.int64})


ORACLES147["l_moments"] = """
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
  SELECT t.event_type, CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
r AS (
  SELECT event_type, x,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY x)
              AS HUGEINT) AS i
  FROM dense
),
s AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS s0,
         SUM((i - 1) * x) AS s1,
         SUM((i - 1) * (i - 2) * x) AS s2,
         SUM((i - 1) * (i - 2) * (i - 3) * x) AS s3
  FROM r GROUP BY 1 HAVING COUNT(*) >= 4
),
b AS (
  SELECT event_type, n,
         CAST(s0 AS DOUBLE) / CAST(n AS DOUBLE) AS b0,
         CAST(s1 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS b1,
         CAST(s2 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
              * CAST(n - 2 AS DOUBLE)) AS b2,
         CAST(s3 AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
              * CAST(n - 2 AS DOUBLE) * CAST(n - 3 AS DOUBLE)) AS b3
  FROM s
),
l AS (
  SELECT event_type, n, b0 AS l1,
         CAST(2.0 AS DOUBLE) * b1 - b0 AS l2,
         CAST(6.0 AS DOUBLE) * b2 - CAST(6.0 AS DOUBLE) * b1 + b0 AS l3,
         CAST(20.0 AS DOUBLE) * b3 - CAST(30.0 AS DOUBLE) * b2
           + CAST(12.0 AS DOUBLE) * b1 - b0 AS l4
  FROM b
)
SELECT event_type, n AS n_hours,
       ROUND(l1, 6) AS l1, ROUND(l2, 6) AS l2,
       ROUND(l3 / l2, 6) AS t3, ROUND(l4 / l2, 6) AS t4
FROM l WHERE l2 <> 0
"""


QUERIES147["l_moments"] = q_l_moments
