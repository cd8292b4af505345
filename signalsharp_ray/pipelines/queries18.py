"""Round-3 batch 20: load-shape and generative-model diagnostics —
crest factor with Tukey trimean per event type (peak-to-mean headroom
sizing over nearest-rank order statistics), the longest zero-load
drought per type on the dense hourly grid (integer island lengths),
the entropy rate of the first-order behaviour Markov chain (how
predictable is the next action given the current one), and a lognormal
fit of document lengths per source (the classic web-corpus length
model).

House parity: crest/trimean ingredients are exact integer order
statistics and sums; drought runs are pure integer island arithmetic;
the entropy rate and lognormal moments are ascending-order left-folds
of libm logs over exact integer counts (list_sum contract), with
exp(mu) for the median estimate (libm exp == DuckDB exp bitwise).

Scale contracts: hourly profiles and transition matrices are
catalog-bounded after one exchange; the lognormal fit folds per source
through bucketed_map_groups ordered by doc_id (the quantiles
contract) — no driver-side corpus state anywhere.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries5 import markov_bucket_kernel
from .queries6 import HOUR_US, _hourly_counts
from .queries14 import _fold

QUERIES18: dict = {}
ORACLES18: dict = {}


# ---------------------------------------------------------------------------
# Crest factor + trimean per event type
# ---------------------------------------------------------------------------


def q_crest_factor(sf_dir: str):
    """Per event type: crest factor (peak hourly load over mean hourly
    load — the headroom multiplier autoscaling must cover) and the
    Tukey trimean (Q1 + 2*Q2 + Q3)/4 of the hourly counts, with every
    quartile the exact ceil(q*n)-th order statistic."""
    agg = _hourly_counts(sf_dir)
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        v = np.sort(g["n_sum"].to_numpy(np.int64))
        n = v.size
        s = int(v.sum())
        mx = int(v[-1])
        q1 = int(v[(25 * n + 99) // 100 - 1])
        q2 = int(v[(50 * n + 99) // 100 - 1])
        q3 = int(v[(75 * n + 99) // 100 - 1])
        crest = float(mx) / (float(s) / float(n))
        trimean = (float(q1) + 2.0 * float(q2) + float(q3)) / 4.0
        rows.append((t, n, mx, s, float(_r6away(crest)), float(_r6away(trimean))))
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_hours", "peak", "total", "crest", "trimean"],
    ).astype({"n_hours": np.int64, "peak": np.int64, "total": np.int64})


ORACLES18["crest_factor"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT event_type, n,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY n) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM h
),
q AS (
  SELECT event_type,
         MAX(cnt) AS n_hours,
         MAX(n) AS mx,
         CAST(SUM(n) AS BIGINT) AS s,
         MAX(CASE WHEN rn = (25 * cnt + 99) // 100 THEN n END) AS q1,
         MAX(CASE WHEN rn = (50 * cnt + 99) // 100 THEN n END) AS q2,
         MAX(CASE WHEN rn = (75 * cnt + 99) // 100 THEN n END) AS q3
  FROM r GROUP BY 1
)
SELECT event_type,
       CAST(n_hours AS BIGINT) AS n_hours,
       CAST(mx AS BIGINT) AS peak,
       s AS total,
       ROUND(CAST(mx AS DOUBLE)
             / (CAST(s AS DOUBLE) / CAST(n_hours AS DOUBLE)), 6) AS crest,
       ROUND((CAST(q1 AS DOUBLE) + 2.0 * CAST(q2 AS DOUBLE)
              + CAST(q3 AS DOUBLE)) / 4.0, 6) AS trimean
FROM q
"""


# ---------------------------------------------------------------------------
# Longest zero-load drought per type (dense grid)
# ---------------------------------------------------------------------------


def q_max_drought(sf_dir: str):
    """Per event type: total zero-load hours and the longest
    consecutive zero-load run on the dense [min,max] hourly grid — the
    availability-gap profile (gap_report lists gaps between points;
    this measures dense-grid silence per type). Pure integer island
    arithmetic on both sides; types with no silent hours emit explicit
    zeros so the schema never collapses."""
    agg = _hourly_counts(sf_dir)
    lo = int(agg["hour_us"].min())
    hi = int(agg["hour_us"].max())
    grid_n = (hi - lo) // HOUR_US + 1
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        v = np.zeros(grid_n, dtype=np.int64)
        v[(g["hour_us"].to_numpy(np.int64) - lo) // HOUR_US] = g["n_sum"].to_numpy(
            np.int64
        )
        zero = v == 0
        nz = int(zero.sum())
        if nz == 0:
            rows.append((t, 0, 0))
            continue
        # island lengths via boundaries
        padded = np.concatenate(([False], zero, [False]))
        starts = np.flatnonzero(padded[1:] & ~padded[:-1])
        ends = np.flatnonzero(~padded[1:] & padded[:-1])
        rows.append((t, nz, int((ends - starts).max())))
    return pd.DataFrame(
        rows, columns=["event_type", "n_zero_hours", "max_drought_h"]
    ).astype({"n_zero_hours": np.int64, "max_drought_h": np.int64})


ORACLES18["max_drought"] = """
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
         CAST(COALESCE(h.n, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) AS idx
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
z AS (
  SELECT event_type, idx,
         idx - ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY idx) AS grp
  FROM dense WHERE v = 0
),
isl AS (
  SELECT event_type, grp, COUNT(*) AS len
  FROM z GROUP BY 1, 2
),
runs AS (
  SELECT event_type, CAST(SUM(len) AS BIGINT) AS nz,
         CAST(MAX(len) AS BIGINT) AS mx
  FROM isl GROUP BY 1
)
SELECT t.event_type,
       COALESCE(r.nz, 0) AS n_zero_hours,
       COALESCE(r.mx, 0) AS max_drought_h
FROM types t LEFT JOIN runs r USING (event_type)
"""


# ---------------------------------------------------------------------------
# Markov-chain entropy rate
# ---------------------------------------------------------------------------


def q_markov_entropy_rate(sf_dir: str):
    """Entropy rate (nats per step) of the empirical first-order
    behaviour chain: -sum over (from,to) of (n_ij/N) * ln(n_ij/n_i) —
    how unpredictable the next user action is given the current one,
    against the ln(n_states) ceiling. Pair counts come from the same
    per-user consecutive-pair exchange as markov_transitions; the fold
    runs over ascending (from,to) on both engines."""
    ev = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "user_id": batch["user_id"].astype(np.int64),
                "ts_us": batch["ts"].to_numpy("datetime64[us]").view(np.int64),
                "event_id": batch["event_id"].astype(np.int64),
                "event_type": batch["event_type"],
            }
        )

    pairs = bucketed_map_groups(
        ev.map_batches(prep, batch_format="pandas"),
        ["user_id"],
        None,
        whole_bucket_fn=markov_bucket_kernel,
    )
    agg = (
        hash_bucket_aggregate(pairs, ["from_type", "to_type"], [("n", "sum")])
        .to_pandas()  # |types|^2 rows — tiny
        .sort_values(["from_type", "to_type"])
    )
    total = int(agg["n_sum"].sum())
    n_i = agg.groupby("from_type")["n_sum"].transform("sum").astype(np.int64)
    terms = [
        (float(int(nij)) / float(total))
        * math.log(float(int(nij)) / float(int(ni)))
        for nij, ni in zip(agg["n_sum"], n_i)
    ]
    rate = -_fold(terms)
    n_states = int(agg["from_type"].nunique())
    return pd.DataFrame(
        {
            "n_transitions": np.array([total], dtype=np.int64),
            "n_states": np.array([n_states], dtype=np.int64),
            "entropy_rate": [float(_r6away(rate))],
            "max_rate": [float(_r6away(math.log(float(n_states))))],
        }
    )


ORACLES18["markov_entropy_rate"] = """
WITH s AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS nxt
  FROM events
),
t AS (
  SELECT event_type AS from_type, nxt AS to_type, COUNT(*) AS n
  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2
),
w AS (
  SELECT from_type, to_type, n,
         CAST(SUM(n) OVER (PARTITION BY from_type) AS BIGINT) AS ni,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM t
),
a AS (
  SELECT MAX(total) AS total,
         COUNT(DISTINCT from_type) AS n_states,
         list_sum(list((CAST(n AS DOUBLE) / CAST(total AS DOUBLE))
                       * ln(CAST(n AS DOUBLE) / CAST(ni AS DOUBLE))
                       ORDER BY from_type, to_type)) AS f
  FROM w
)
SELECT CAST(total AS BIGINT) AS n_transitions,
       CAST(n_states AS BIGINT) AS n_states,
       ROUND(-f, 6) AS entropy_rate,
       ROUND(ln(CAST(n_states AS DOUBLE)), 6) AS max_rate
FROM a
"""


# ---------------------------------------------------------------------------
# Lognormal fit of document lengths per source
# ---------------------------------------------------------------------------


def q_doclen_lognormal(sf_dir: str):
    """Per source: maximum-likelihood lognormal fit of document lengths
    (n_chars > 0): mu and sigma of ln(L) plus the exp(mu) median
    estimate — the standard web-corpus length model used to budget
    chunking. Log moments fold in ascending doc_id order on both
    engines; exp/ln/sqrt are libm == DuckDB."""
    docs = _documents(sf_dir, ["doc_id", "source", "n_chars"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        df = batch[batch["n_chars"].astype(np.int64) > 0]
        return pd.DataFrame(
            {
                "source": df["source"],
                "doc_id": df["doc_id"].astype(np.int64),
                "length": df["n_chars"].astype(np.int64),
            }
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("doc_id")
        logs = [math.log(float(int(x))) for x in df["length"]]
        n = len(logs)
        f1 = _fold(logs)
        f2 = _fold([x * x for x in logs])
        mu = f1 / float(n)
        var = f2 / float(n) - mu * mu
        # clamp: constant lengths can round var to a tiny negative; the
        # SQL side applies the identical GREATEST(var, 0)
        sigma = math.sqrt(var if var > 0.0 else 0.0)
        return pd.DataFrame(
            {
                "source": [df["source"].iloc[0]],
                "n_docs": np.array([n], dtype=np.int64),
                "ln_mu": [float(_r6away(mu))],
                "ln_sigma": [float(_r6away(sigma))],
                "median_est": [float(_r6away(math.exp(mu)))],
            }
        )

    return bucketed_map_groups(
        docs.map_batches(prep, batch_format="pandas"), ["source"], kernel
    )


ORACLES18["doclen_lognormal"] = """
WITH d AS (
  SELECT source, doc_id, ln(CAST(n_chars AS DOUBLE)) AS x
  FROM documents WHERE n_chars > 0
),
a AS (
  SELECT source, COUNT(*) AS n,
         list_sum(list(x ORDER BY doc_id)) AS f1,
         list_sum(list(x * x ORDER BY doc_id)) AS f2
  FROM d GROUP BY 1
)
SELECT source,
       CAST(n AS BIGINT) AS n_docs,
       ROUND(f1 / CAST(n AS DOUBLE), 6) AS ln_mu,
       ROUND(sqrt(GREATEST(f2 / CAST(n AS DOUBLE)
                  - (f1 / CAST(n AS DOUBLE)) * (f1 / CAST(n AS DOUBLE)),
                  CAST(0.0 AS DOUBLE))), 6)
         AS ln_sigma,
       ROUND(exp(f1 / CAST(n AS DOUBLE)), 6) AS median_est
FROM a
"""


QUERIES18["crest_factor"] = q_crest_factor
QUERIES18["max_drought"] = q_max_drought
QUERIES18["markov_entropy_rate"] = q_markov_entropy_rate
QUERIES18["doclen_lognormal"] = q_doclen_lognormal
