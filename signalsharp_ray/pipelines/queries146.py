"""Round-4 batch 146: circular statistics on the 24-hour clock — the
circular mean hour (WHERE on the clock a stream's activity centers:
arithmetic means break at midnight, the circular mean doesn't), the
resultant length R (how concentrated around that hour, 0 = uniform,
1 = a single spike), and the first-harmonic amplitude (the peak-to-mean
swing a single daily sinusoid explains).

House parity: the trig sums fold n_h * cos/sin(2 pi h / 24) over the
24 exact hour-of-day counts in ascending h (libm cos/sin == DuckDB, the
periodogram contract); mean hour uses atan2 (shared libm) mapped to
[0, 24); R and the amplitude are transcribed expressions.

Scale contracts: one bucketed (type, hour-of-day) exchange; every fold
is over 24 cells."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries121 import _hod_profiles

QUERIES146: dict = {}
ORACLES146: dict = {}


def q_circular_hour_stats(sf_dir: str):
    """Per event_type over the exact hour-of-day histogram: C = sum n_h
    cos(2 pi h/24), S = likewise with sin, the circular mean hour
    atan2(S, C) * 24/(2 pi) wrapped to [0, 24), the resultant length
    R = sqrt(C^2 + S^2)/n, and the first-harmonic amplitude 2R relative
    to the mean hourly rate — the clock-centered summary a diurnal
    dashboard leads with."""
    prof = _hod_profiles(sf_dir)
    rows = []
    for t in sorted(prof["event_type"].unique()):
        g = prof[prof["event_type"] == t]
        v = np.zeros(24, dtype=np.int64)
        v[g["hod"].to_numpy(np.int64)] = g["n_sum"].to_numpy(np.int64)
        n = int(v.sum())
        if n == 0:
            continue
        c = 0.0
        s = 0.0
        for h in range(24):  # ascending fold
            ang = 2.0 * math.pi * float(h) / 24.0
            c = c + float(v[h]) * math.cos(ang)
            s = s + float(v[h]) * math.sin(ang)
        mean_ang = math.atan2(s, c)
        mean_hour = mean_ang * 24.0 / (2.0 * math.pi)
        if mean_hour < 0.0:
            mean_hour = mean_hour + 24.0
        r = math.sqrt(c * c + s * s) / float(n)
        rows.append(
            (
                t,
                n,
                float(_r6away(mean_hour)),
                float(_r6away(r)),
                float(_r6away(2.0 * r)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_events", "mean_hour", "resultant_r",
                 "harmonic_amplitude"],
    ).astype({"n_events": np.int64})


ORACLES146["circular_hour_stats"] = """
WITH h AS (
  SELECT event_type,
         CAST((epoch_us(ts) // 3600000000) % 24 AS BIGINT) AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
hours AS (SELECT unnest(generate_series(0, 23)) AS hod),
types AS (SELECT DISTINCT event_type FROM h),
prof AS (
  SELECT t.event_type, hr.hod, CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN hours hr
  LEFT JOIN h ON h.event_type = t.event_type AND h.hod = hr.hod
),
cs AS (
  SELECT event_type, CAST(SUM(x) AS BIGINT) AS n,
         list_sum(list(CAST(x AS DOUBLE)
                       * cos(CAST(2.0 AS DOUBLE) * pi()
                             * CAST(hod AS DOUBLE) / CAST(24.0 AS DOUBLE))
                       ORDER BY hod)) AS c,
         list_sum(list(CAST(x AS DOUBLE)
                       * sin(CAST(2.0 AS DOUBLE) * pi()
                             * CAST(hod AS DOUBLE) / CAST(24.0 AS DOUBLE))
                       ORDER BY hod)) AS s
  FROM prof GROUP BY 1 HAVING SUM(x) > 0
),
f AS (
  SELECT event_type, n, c, s,
         atan2(s, c) * CAST(24.0 AS DOUBLE)
           / (CAST(2.0 AS DOUBLE) * pi()) AS mh,
         sqrt(c * c + s * s) / CAST(n AS DOUBLE) AS r
  FROM cs
)
SELECT event_type, n AS n_events,
       ROUND(CASE WHEN mh < 0 THEN mh + CAST(24.0 AS DOUBLE) ELSE mh END, 6)
         AS mean_hour,
       ROUND(r, 6) AS resultant_r,
       ROUND(CAST(2.0 AS DOUBLE) * r, 6) AS harmonic_amplitude
FROM f
"""


QUERIES146["circular_hour_stats"] = q_circular_hour_stats
