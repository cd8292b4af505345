"""Round-3 batch 13: operational stream analytics over the hourly grid —
rolling min/max envelopes (the morphological erosion/dilation bands),
token-bucket admission simulation (exact integer replay of a rate
limiter over the observed load), hour-of-day deseasonalization, and
load-regime run-length encoding.

House parity: envelopes, bucket states and regime labels are pure
integers; the deseasonalized series is ONE transcribed float expression
per row over exact integer ingredients; the token bucket is an integer
recursion replayed by a recursive CTE (min/least and subtraction only —
no float drift possible).

Scale contracts: all four consume the catalog-x-retention-bounded hourly
count table; outputs are bounded by types x retention hours.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries2 import _r6away
from .queries6 import _hourly_counts
from .queries8 import _dense_by_type

HOUR_US = 3_600_000_000

BUCKET_CAP = 20
BUCKET_REFILL = 3

QUERIES11: dict = {}
ORACLES11: dict = {}


# ---------------------------------------------------------------------------
# Rolling 24h min/max envelope
# ---------------------------------------------------------------------------


def q_rolling_envelope_24h(sf_dir: str):
    """Per event type: rolling 24-hour min / max / range of the dense
    hourly counts — the erosion/dilation envelope that brackets load for
    threshold placement (bollinger_bands gives mean±σ; this gives the
    exact order-statistic band). Integer end-to-end."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    W = 24
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        if v.size < W:
            continue
        sw = np.lib.stride_tricks.sliding_window_view(v, W)
        lo = sw.min(axis=1)
        hi = sw.max(axis=1)
        rows.append(
            pd.DataFrame(
                {
                    "event_type": t,
                    "hour_us": grid[W - 1 :],
                    "env_min": lo,
                    "env_max": hi,
                    "env_range": hi - lo,
                }
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.astype(
        {"hour_us": np.int64, "env_min": np.int64, "env_max": np.int64,
         "env_range": np.int64}
    )


ORACLES11["rolling_envelope_24h"] = """
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
w AS (
  SELECT event_type, bh,
         ROW_NUMBER() OVER win AS rn,
         MIN(v) OVER (win ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS env_min,
         MAX(v) OVER (win ROWS BETWEEN 23 PRECEDING AND CURRENT ROW) AS env_max
  FROM dense
  WINDOW win AS (PARTITION BY event_type ORDER BY bh)
)
SELECT event_type, CAST(epoch_us(bh) AS BIGINT) AS hour_us,
       env_min, env_max, env_max - env_min AS env_range
FROM w WHERE rn >= 24
"""


# ---------------------------------------------------------------------------
# Token-bucket admission simulation
# ---------------------------------------------------------------------------


def token_bucket_replay(v: np.ndarray, cap: int = BUCKET_CAP,
                        refill: int = BUCKET_REFILL):
    """(avail, served, dropped, remaining) int64 arrays: replay a token
    bucket over hourly arrivals — avail_t = min(b_{t-1} + refill, cap)
    with b_{-1} = cap, served = min(x, avail), b_t = avail - served."""
    n = v.size
    avail = np.zeros(n, dtype=np.int64)
    served = np.zeros(n, dtype=np.int64)
    b = cap
    for t in range(n):  # bounded by retention hours
        a = min(b + refill, cap)
        s = min(int(v[t]), a)
        avail[t] = a
        served[t] = s
        b = a - s
    dropped = v - served
    remaining = avail - served
    return avail, served, dropped, remaining


def q_token_bucket_sim(sf_dir: str):
    """Per (event type, hour): exact replay of a token-bucket rate
    limiter (capacity 20, refill 3/hour) over the observed hourly
    arrivals — served / dropped / tokens left. The what-if admission
    simulation behind capacity planning; a pure-integer two-term
    recursion, replayed by a recursive CTE on the oracle side."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        _avail, served, dropped, remaining = token_bucket_replay(v)
        rows.append(
            pd.DataFrame(
                {
                    "event_type": t,
                    "hour_us": grid,
                    "arrivals": v,
                    "served": served,
                    "dropped": dropped,
                    "tokens_left": remaining,
                }
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.astype(
        {c: np.int64 for c in
         ["hour_us", "arrivals", "served", "dropped", "tokens_left"]}
    )


ORACLES11["token_bucket_sim"] = f"""
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
         g.bh, CAST(COALESCE(h.n, 0) AS BIGINT) AS v
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
tb AS (
  SELECT event_type, CAST(-1 AS BIGINT) AS idx,
         CAST({BUCKET_CAP} AS BIGINT) AS b
  FROM (SELECT DISTINCT event_type FROM base)
  UNION ALL
  SELECT b2.event_type, b2.idx,
         least(tb.b + {BUCKET_REFILL}, {BUCKET_CAP})
           - least(b2.v, least(tb.b + {BUCKET_REFILL}, {BUCKET_CAP})) AS b
  FROM tb JOIN base b2
    ON b2.event_type = tb.event_type AND b2.idx = tb.idx + 1
)
SELECT b2.event_type, CAST(epoch_us(b2.bh) AS BIGINT) AS hour_us,
       b2.v AS arrivals,
       least(b2.v, least(tb.b + {BUCKET_REFILL}, {BUCKET_CAP})) AS served,
       b2.v - least(b2.v, least(tb.b + {BUCKET_REFILL}, {BUCKET_CAP})) AS dropped,
       least(tb.b + {BUCKET_REFILL}, {BUCKET_CAP})
         - least(b2.v, least(tb.b + {BUCKET_REFILL}, {BUCKET_CAP})) AS tokens_left
FROM tb JOIN base b2
  ON b2.event_type = tb.event_type AND b2.idx = tb.idx + 1
"""


# ---------------------------------------------------------------------------
# Hour-of-day deseasonalization
# ---------------------------------------------------------------------------


def q_deseasonalized_1h(sf_dir: str):
    """Per (event type, hour): the hourly count with its hour-of-day
    profile removed and the global level restored — adj = v - S_g/n_g +
    S/n over the dense grid (S_g, n_g = that hour-of-day's sum/count for
    the type). The residual series changepoint detectors should run on
    when diurnality would otherwise dominate. One transcribed float
    expression per row; ingredients exact integers."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    hod = (grid // HOUR_US % 24).astype(np.int64)
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        n = v.size
        S = int(v.sum())
        sg = np.zeros(24, dtype=np.int64)
        ng = np.zeros(24, dtype=np.int64)
        np.add.at(sg, hod, v)
        np.add.at(ng, hod, 1)
        adj = (
            v.astype(np.float64)
            - sg[hod].astype(np.float64) / ng[hod].astype(np.float64)
            + float(S) / float(n)
        )
        rows.append(
            pd.DataFrame(
                {"event_type": t, "hour_us": grid, "adj": _r6away(adj)}
            )
        )
    out = pd.concat(rows, ignore_index=True)
    return out.astype({"hour_us": np.int64})


ORACLES11["deseasonalized_1h"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT t.event_type, g.bh,
         CAST(epoch_us(g.bh) AS BIGINT) // 3600000000 % 24 AS hod,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS v
  FROM (SELECT DISTINCT event_type FROM h) t
  CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
prof AS (
  SELECT event_type, hod, CAST(SUM(v) AS BIGINT) AS sg, COUNT(*) AS ng
  FROM dense GROUP BY 1, 2
),
tot AS (
  SELECT event_type, CAST(SUM(v) AS BIGINT) AS s, COUNT(*) AS n
  FROM dense GROUP BY 1
)
SELECT d.event_type, CAST(epoch_us(d.bh) AS BIGINT) AS hour_us,
       ROUND(CAST(d.v AS DOUBLE)
             - CAST(p.sg AS DOUBLE) / CAST(p.ng AS DOUBLE)
             + CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE), 6) AS adj
FROM dense d
JOIN prof p ON p.event_type = d.event_type AND p.hod = d.hod
JOIN tot t ON t.event_type = d.event_type
"""


# ---------------------------------------------------------------------------
# Load-regime run-length encoding
# ---------------------------------------------------------------------------


def q_load_regime_runs(sf_dir: str):
    """Per event type: maximal runs of constant load regime, where the
    regime is sign(n·v - S) — below (-1), at (0) or above (+1) the type's
    own mean, multiplied out so the label is exact integer. The RLE
    symbol stream a regime-duration model consumes (mean_crossing_rate
    counts the flips; this emits the segments)."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    rows = []
    for i, t in enumerate(types):
        v = mat[i]
        n = v.size
        S = int(v.sum())
        state = np.sign(n * v - S).astype(np.int64)
        # run starts where the state differs from its predecessor
        start = np.concatenate([[True], state[1:] != state[:-1]])
        run_id = np.cumsum(start) - 1
        df = pd.DataFrame({"run": run_id, "h": grid, "state": state})
        g = df.groupby("run", sort=True).agg(
            start_us=("h", "min"), n_hours=("h", "size"), state=("state", "first")
        )
        g["event_type"] = t
        rows.append(g.reset_index(drop=True))
    out = pd.concat(rows, ignore_index=True)
    return out[["event_type", "start_us", "state", "n_hours"]].astype(
        {"start_us": np.int64, "state": np.int64, "n_hours": np.int64}
    )


ORACLES11["load_regime_runs"] = """
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
lab AS (
  SELECT d.event_type, d.bh,
         CAST(sign(t.n * d.v - t.s) AS BIGINT) AS state
  FROM dense d JOIN tot t USING (event_type)
),
r AS (
  SELECT event_type, bh, state,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bh)
           - ROW_NUMBER() OVER (PARTITION BY event_type, state ORDER BY bh)
           AS island
  FROM lab
)
SELECT event_type,
       CAST(epoch_us(MIN(bh)) AS BIGINT) AS start_us,
       state,
       COUNT(*) AS n_hours
FROM r GROUP BY event_type, state, island
"""


QUERIES11["rolling_envelope_24h"] = q_rolling_envelope_24h
QUERIES11["token_bucket_sim"] = q_token_bucket_sim
QUERIES11["deseasonalized_1h"] = q_deseasonalized_1h
QUERIES11["load_regime_runs"] = q_load_regime_runs
