"""Round-3 batch 57: the hour-of-day percentile band profile — for each
hour of the day, the exact nearest-rank p10 / median / p90 of its
per-day load distribution (the expected envelope an anomaly detector
draws around 'normal for 3 am'; hourly_profile gives means, this gives
bands).

House parity: per-(day, hod) counts are exact integers through one
exchange; each band is the exact ceil(q*n)-th order statistic of the
per-day loads for that hour — no interpolation anywhere.

Scale contracts: the (day, hod) table is retention-bounded; per-hod
order statistics sort at most #days values.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _events

QUERIES55: dict = {}
ORACLES55: dict = {}

HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


def q_hod_percentile_bands(sf_dir: str):
    """Per hour-of-day: day count and the exact nearest-rank p10 /
    p50 / p90 of that hour's per-day total load — the normal-envelope
    table behind time-of-day anomaly thresholds. Days where the hour
    is silent contribute zero via the dense per-day grid."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
                "hod": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // HOUR_US
                )
                % 24,
            }
        )
        .groupby(["day_us", "hod"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(ev, ["day_us", "hod"], [("n", "sum")]).to_pandas()
    days = sorted(agg["day_us"].unique())
    nd = len(days)
    rows = []
    for hod in range(24):
        g = agg[agg["hod"] == hod]
        v = np.zeros(nd, dtype=np.int64)
        dmap = {d: i for i, d in enumerate(days)}
        for d, n in zip(g["day_us"], g["n_sum"]):
            v[dmap[int(d)]] = int(n)
        v = np.sort(v)
        q = lambda p: int(v[(p * nd + 99) // 100 - 1])
        rows.append((hod, nd, q(10), q(50), q(90)))
    return pd.DataFrame(
        rows, columns=["hod", "n_days", "p10", "p50", "p90"]
    ).astype(
        {
            "hod": np.int64,
            "n_days": np.int64,
            "p10": np.int64,
            "p50": np.int64,
            "p90": np.int64,
        }
    )


ORACLES55["hod_percentile_bands"] = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
days AS (SELECT DISTINCT day FROM c),
hods AS (SELECT UNNEST(generate_series(0, 23)) AS hod),
dense AS (
  SELECT d.day, h.hod, CAST(COALESCE(c.n, 0) AS BIGINT) AS v
  FROM days d CROSS JOIN hods h
  LEFT JOIN c ON c.day = d.day AND c.hod = h.hod
),
r AS (
  SELECT hod, v,
         ROW_NUMBER() OVER (PARTITION BY hod ORDER BY v) AS rn,
         COUNT(*) OVER (PARTITION BY hod) AS cnt
  FROM dense
)
SELECT CAST(hod AS BIGINT) AS hod,
       CAST(MAX(cnt) AS BIGINT) AS n_days,
       MAX(CASE WHEN rn = (10 * cnt + 99) // 100 THEN v END) AS p10,
       MAX(CASE WHEN rn = (50 * cnt + 99) // 100 THEN v END) AS p50,
       MAX(CASE WHEN rn = (90 * cnt + 99) // 100 THEN v END) AS p90
FROM r GROUP BY 1
"""


QUERIES55["hod_percentile_bands"] = q_hod_percentile_bands
