"""Round-4 batch 148: age of information — the continuous-time average
staleness of each stream (how old is "the latest event" on average, the
metric freshness-SLA dashboards should show instead of mean gap): the
sawtooth integral gives avg AoI = sum(g_i^2) / (2 * span) exactly, plus
the peak AoI (max gap) — both from exact integer microsecond gaps.

House parity: sum of squared gaps is an exact HUGEINT; avg AoI is one
transcribed division; peak AoI is an integer max.

Scale contracts: per-type sequential gaps under the bucketed_map_groups
contract; only one summary row per type leaves the kernel."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups
from .queries2 import _events, _r6away

QUERIES148: dict = {}
ORACLES148: dict = {}


def q_age_of_information(sf_dir: str):
    """Per event_type: the time-averaged age of the newest event over
    the observation span [first, last] — the integral of the sawtooth
    (age resets to 0 at each event, grows linearly between) equals
    sum(g_i^2)/2, so avg AoI = sum(g_i^2) / (2 * span) — next to the
    worst-case staleness max(g). Types with fewer than 2 events (zero
    span) are excluded."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_events": pd.Series([], dtype=np.int64),
                "span_us": pd.Series([], dtype=np.int64),
                "peak_aoi_us": pd.Series([], dtype=np.int64),
                "avg_aoi_us": pd.Series([], dtype=np.float64),
            }
        )
        if ts.size < 2:
            return empty
        gaps = (ts[1:] - ts[:-1]).astype(object)
        span = int(ts[-1] - ts[0])
        if span == 0:
            return empty
        ssq = 0
        peak = 0
        for g in gaps:
            gi = int(g)
            ssq += gi * gi
            if gi > peak:
                peak = gi
        avg = float(ssq) / (2.0 * float(span))
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_events": np.array([ts.size], dtype=np.int64),
                "span_us": np.array([span], dtype=np.int64),
                "peak_aoi_us": np.array([peak], dtype=np.int64),
                "avg_aoi_us": [float(_r6away(avg))],
            }
        )

    return bucketed_map_groups(
        _events(sf_dir, ["event_type", "ts", "event_id"]),
        ["event_type"],
        fn,
    )


ORACLES148["age_of_information"] = """
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
),
spans AS (
  SELECT event_type, COUNT(*) AS n,
         MAX(epoch_us(ts)) - MIN(epoch_us(ts)) AS span
  FROM events GROUP BY 1
),
g AS (
  SELECT s.event_type,
         SUM(CAST(s.gap AS HUGEINT) * s.gap) AS ssq,
         CAST(MAX(s.gap) AS BIGINT) AS peak
  FROM s WHERE s.gap IS NOT NULL GROUP BY 1
)
SELECT sp.event_type, CAST(sp.n AS BIGINT) AS n_events,
       CAST(sp.span AS BIGINT) AS span_us,
       g.peak AS peak_aoi_us,
       ROUND(CAST(g.ssq AS DOUBLE)
             / (CAST(2.0 AS DOUBLE) * CAST(sp.span AS DOUBLE)), 6)
         AS avg_aoi_us
FROM spans sp JOIN g USING (event_type)
WHERE sp.n >= 2 AND sp.span > 0
"""


QUERIES148["age_of_information"] = q_age_of_information
