"""Round-4 batch 135: queueing replay, M4 visual downsampling, and
heavy-tail estimation — the Lindley single-server queue recursion
replayed over each type's real interarrival times ("if handling took
200 ms, what backlog would have built"), the M4 aggregation (per
pixel-bucket min/max/first/last — the lossless-for-rendering downsample
beside LTTB), and the Hill estimator of the value distribution's tail
index (how heavy the revenue tail really is).

House parity: the Lindley recursion W' = max(0, W + S - A) runs in
exact integer MICROSECONDS (no float anywhere) and replays as a
recursive CTE over the per-type event sequence; M4 selects rows by
integer bucket arithmetic with (ts, event_id) determinism and exact
cent extremes; Hill's sum folds ln(x_i / x_kplus1) over ascending rank
with exact integer order statistics inside the logs.

Scale contracts: the queue replay and M4 run under the
bucketed_map_groups per-series contract (catalog-bounded groups); Hill
consumes the exact per-type value histogram through one exchange."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries14 import _fold

QUERIES135: dict = {}
ORACLES135: dict = {}

SERVICE_US = 200_000  # 200 ms hypothetical service time
M4_BUCKETS = 100
HILL_K = 100


# ---------------------------------------------------------------------------
# Lindley queue replay
# ---------------------------------------------------------------------------


def q_lindley_queue_replay(sf_dir: str):
    """Per event_type: replay the single-server Lindley recursion
    W_{i+1} = max(0, W_i + S - A_i) over the REAL interarrival gaps A_i
    (sorted by ts, event_id) with a hypothetical 200 ms service time —
    the what-if backlog question behind capacity sizing. Emits the
    events-delayed count, total and max wait, all exact integer
    microseconds."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        n = ts.size
        w = 0
        waited = 0
        total = 0
        mx = 0
        for i in range(1, n):
            a = int(ts[i] - ts[i - 1])
            w = w + SERVICE_US - a
            if w < 0:
                w = 0
            if w > 0:
                waited += 1
                total += w
                if w > mx:
                    mx = w
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_events": np.array([n], dtype=np.int64),
                "n_delayed": np.array([waited], dtype=np.int64),
                "total_wait_us": np.array([total], dtype=np.int64),
                "max_wait_us": np.array([mx], dtype=np.int64),
            }
        )

    return bucketed_map_groups(
        _events(sf_dir, ["event_type", "ts", "event_id"]),
        ["event_type"],
        fn,
    )


ORACLES135["lindley_queue_replay"] = f"""
WITH RECURSIVE base AS MATERIALIZED (
  SELECT event_type,
         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                 ORDER BY ts, event_id) - 1 AS BIGINT)
           AS idx,
         epoch_us(ts) AS t
  FROM events
),
rec AS (
  SELECT event_type, idx, CAST(0 AS BIGINT) AS w,
         CAST(0 AS BIGINT) AS waited, CAST(0 AS BIGINT) AS total,
         CAST(0 AS BIGINT) AS mx, t
  FROM base WHERE idx = 0
  UNION ALL
  SELECT b.event_type, b.idx,
         greatest(CAST(0 AS BIGINT), rec.w + {SERVICE_US} - (b.t - rec.t))
           AS w,
         rec.waited + CASE WHEN greatest(CAST(0 AS BIGINT),
                             rec.w + {SERVICE_US} - (b.t - rec.t)) > 0
                           THEN 1 ELSE 0 END,
         rec.total + greatest(CAST(0 AS BIGINT),
                              rec.w + {SERVICE_US} - (b.t - rec.t)),
         greatest(rec.mx, greatest(CAST(0 AS BIGINT),
                                   rec.w + {SERVICE_US} - (b.t - rec.t))),
         b.t
  FROM rec JOIN base b
    ON b.event_type = rec.event_type AND b.idx = rec.idx + 1
)
SELECT event_type, CAST(idx + 1 AS BIGINT) AS n_events,
       CAST(waited AS BIGINT) AS n_delayed,
       CAST(total AS BIGINT) AS total_wait_us,
       CAST(mx AS BIGINT) AS max_wait_us
FROM rec
QUALIFY ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx DESC) = 1
"""


# ---------------------------------------------------------------------------
# M4 visual downsampling
# ---------------------------------------------------------------------------


def q_m4_downsample(sf_dir: str, n_buckets: int = M4_BUCKETS):
    """M4 aggregation per event_type: the time span splits into 100
    equal buckets; each bucket keeps min/max value (exact cents) and the
    first/last values by (ts, event_id) — the downsample that renders
    pixel-identical line charts (Jugel et al., M4). Bucket indices are
    integer arithmetic on the type's own [min, max] span; the last
    timestamp clamps into the final bucket."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"])
        ts = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        v = df["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        lo, hi = int(ts[0]), int(ts[-1])
        span = hi - lo
        if span == 0:
            b = np.zeros(ts.size, dtype=np.int64)
        else:
            b = ((ts - lo) * n_buckets) // (span + 1)
        et = df["event_type"].iloc[0]
        rows = []
        for bucket in np.unique(b):
            sel = np.nonzero(b == bucket)[0]
            cs = c[sel]
            rows.append(
                (
                    et,
                    int(bucket),
                    sel.size,
                    int(cs.min()),
                    int(cs.max()),
                    int(cs[0]),
                    int(cs[-1]),
                )
            )
        return pd.DataFrame(
            rows,
            columns=[
                "event_type", "bucket", "n_points",
                "min_c", "max_c", "first_c", "last_c",
            ],
        ).astype(
            {
                "bucket": np.int64, "n_points": np.int64, "min_c": np.int64,
                "max_c": np.int64, "first_c": np.int64, "last_c": np.int64,
            }
        )

    return bucketed_map_groups(
        _events(sf_dir, ["event_type", "ts", "event_id", "value"]),
        ["event_type"],
        fn,
    )


ORACLES135["m4_downsample"] = f"""
WITH spans AS (
  SELECT event_type, MIN(epoch_us(ts)) AS lo, MAX(epoch_us(ts)) AS hi
  FROM events GROUP BY 1
),
b AS (
  SELECT e.event_type, e.ts, e.event_id,
         CAST(ROUND(e.value * 100) AS BIGINT) AS c,
         CASE WHEN s.hi = s.lo THEN 0
              ELSE ((epoch_us(e.ts) - s.lo) * {M4_BUCKETS})
                   // (s.hi - s.lo + 1) END AS bucket
  FROM events e JOIN spans s USING (event_type)
),
r AS (
  SELECT event_type, bucket, c,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts, event_id) AS rf,
         ROW_NUMBER() OVER (PARTITION BY event_type, bucket
                            ORDER BY ts DESC, event_id DESC) AS rl
  FROM b
)
SELECT event_type, CAST(bucket AS BIGINT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_points,
       CAST(MIN(c) AS BIGINT) AS min_c,
       CAST(MAX(c) AS BIGINT) AS max_c,
       CAST(MAX(CASE WHEN rf = 1 THEN c END) AS BIGINT) AS first_c,
       CAST(MAX(CASE WHEN rl = 1 THEN c END) AS BIGINT) AS last_c
FROM r GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Hill tail-index estimator
# ---------------------------------------------------------------------------


def q_hill_tail_index(sf_dir: str, k: int = HILL_K):
    """Per event_type: the Hill estimator over the top-100 values —
    H = (1/k) sum ln(x_(i) / x_(k+1)) with x_(i) the i-th largest exact
    centivalue — and the implied tail index alpha = 1/H (alpha < 2 means
    infinite variance: sqrt(n) intuition stops working). Order
    statistics are exact integers; the fold runs over DESCENDING value
    rank (i = 1..k) identically on both sides. Types with fewer than
    k+1 positive values or a zero pivot are excluded."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        v = batch["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        keep = c > 0
        return (
            pd.DataFrame(
                {
                    "event_type": batch["event_type"].to_numpy()[keep],
                    "c": c[keep],
                    "n": np.ones(int(keep.sum()), dtype=np.int64),
                }
            )
            .groupby(["event_type", "c"], sort=False)
            .sum()
            .reset_index()
        )

    hist = (
        hash_bucket_aggregate(
            _events(sf_dir, ["event_type", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["event_type", "c"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["event_type", "c"], ascending=[True, False])
    )
    rows = []
    for et, g in hist.groupby("event_type", sort=True):
        cs = g["c"].to_numpy(np.int64)  # descending
        ns = g["n_sum"].to_numpy(np.int64)
        total = int(ns.sum())
        if total < k + 1:
            continue
        # expand the top k+1 order statistics from the histogram
        top = []
        for cval, cnt in zip(cs, ns):
            take = min(int(cnt), k + 1 - len(top))
            top.extend([int(cval)] * take)
            if len(top) >= k + 1:
                break
        pivot = top[k]
        if pivot <= 0:
            continue
        h = _fold(
            [math.log(float(top[i]) / float(pivot)) for i in range(k)]
        ) / float(k)
        if h <= 0.0:
            continue
        rows.append(
            (et, total, pivot, float(_r6away(h)), float(_r6away(1.0 / h)))
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_positive", "pivot_c", "hill_h", "alpha"],
    ).astype({"n_positive": np.int64, "pivot_c": np.int64})


ORACLES135["hill_tail_index_values"] = f"""
WITH b AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events WHERE CAST(ROUND(value * 100) AS BIGINT) > 0
),
r AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c DESC) AS rk
  FROM b
),
piv AS (
  SELECT event_type, c AS pivot_c FROM r WHERE rk = {HILL_K + 1}
),
tot AS (SELECT event_type, COUNT(*) AS n FROM b GROUP BY 1),
s AS (
  SELECT r.event_type,
         list_sum(list(ln(CAST(r.c AS DOUBLE) / CAST(p.pivot_c AS DOUBLE))
                       ORDER BY r.rk)) / CAST({HILL_K} AS DOUBLE) AS h
  FROM r JOIN piv p USING (event_type)
  WHERE r.rk <= {HILL_K} AND p.pivot_c > 0
  GROUP BY 1
)
SELECT s.event_type, CAST(tot.n AS BIGINT) AS n_positive,
       CAST(p.pivot_c AS BIGINT) AS pivot_c,
       ROUND(s.h, 6) AS hill_h,
       ROUND(CAST(1.0 AS DOUBLE) / s.h, 6) AS alpha
FROM s
JOIN piv p USING (event_type)
JOIN tot USING (event_type)
WHERE s.h > 0
"""


QUERIES135["lindley_queue_replay"] = q_lindley_queue_replay
QUERIES135["m4_downsample"] = q_m4_downsample
QUERIES135["hill_tail_index_values"] = q_hill_tail_index
