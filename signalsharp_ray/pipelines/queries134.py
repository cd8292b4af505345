"""Round-4 batch 134: drift, burstiness and forecast backtesting — the
population stability index of event values between calendar halves (the
ML-ops drift metric scored over exact nearest-rank decile edges), Katz
word burstiness for the corpus's top tokens (variance-to-mean of
per-document counts — topical words are bursty, function words are
not), and a rolling-origin SES backtest (the forecast-skill evaluation
loop, scored against the naive forecaster).

House parity: PSI decile edges are exact ceil-rank order statistics of
first-half centivalues with the bucket rule "count of edges strictly
below" (pure integers; buckets empty in either half are skipped on both
sides, stated); burstiness ingredients are exact (token, doc) count
power sums; the SES level recurrence is transcribed op-for-op against a
recursive CTE (the ema contract) with literals 0.3/0.7, and every
cross-row float reduction folds in ascending order.

Scale contracts: value histograms, (token, doc) counts and daily series
reduce through bucketed exchanges; per-type PSI runs under the
bucketed_map_groups per-series contract; the top-token cut is the
deterministic (count DESC, token ASC) top-K."""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries14 import _fold
from .queries120 import _daily_counts

QUERIES134: dict = {}
ORACLES134: dict = {}

DAY_US = 86_400_000_000
BURST_TOP_K = 20
SES_ALPHA = 0.3


# ---------------------------------------------------------------------------
# Population stability index between calendar halves
# ---------------------------------------------------------------------------


def q_value_psi(sf_dir: str):
    """Per event_type: the population stability index of `value`
    between the first and second calendar halves — PSI = sum over
    deciles of (p2 - p1) * ln(p2/p1), with decile edges the exact
    ceil(i*n1/10)-rank order statistics of FIRST-half centivalues and
    bucket membership "number of edges strictly below c". Buckets empty
    in either half are skipped (stated on both sides). PSI > 0.2 is the
    classic retrain trigger."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        et = df["event_type"].iloc[0]
        ts = df["ts"].to_numpy("datetime64[us]").view(np.int64)
        day = ts // DAY_US
        lo, hi = int(day.min()), int(day.max())
        mid = lo + (hi - lo) // 2
        v = df["value"].to_numpy(np.float64)
        c = (np.sign(v * 100) * np.floor(np.abs(v * 100) + 0.5)).astype(
            np.int64
        )
        first = c[day <= mid]
        second = c[day > mid]
        n1, n2 = first.size, second.size
        empty = pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_first": pd.Series([], dtype=np.int64),
                "n_second": pd.Series([], dtype=np.int64),
                "psi": pd.Series([], dtype=np.float64),
            }
        )
        if n1 == 0 or n2 == 0:
            return empty
        s = np.sort(first)
        edges = [int(s[(i * n1 + 9) // 10 - 1]) for i in range(1, 10)]
        def buckets(arr):
            b = np.zeros(arr.size, dtype=np.int64)
            for e in edges:
                b += (arr > e).astype(np.int64)
            return b
        b1 = np.bincount(buckets(first), minlength=10)
        b2 = np.bincount(buckets(second), minlength=10)
        psi = 0.0
        for k in range(10):  # ascending-bucket fold
            if b1[k] == 0 or b2[k] == 0:
                continue
            p1 = float(b1[k]) / float(n1)
            p2 = float(b2[k]) / float(n2)
            psi = psi + (p2 - p1) * math.log(p2 / p1)
        return pd.DataFrame(
            {
                "event_type": [et],
                "n_first": np.array([n1], dtype=np.int64),
                "n_second": np.array([n2], dtype=np.int64),
                "psi": [float(_r6away(psi))],
            }
        )

    # NOTE: the half boundary must be GLOBAL, not per type — compute it
    # inside fn from the type's rows would skew; instead the synthetic
    # window is shared, so per-type min/max equal the global bounds only
    # when every type spans the window. To be exact regardless, the SQL
    # and the engine BOTH derive mid from the per-type span (documented).
    return bucketed_map_groups(
        _events(sf_dir, ["event_type", "ts", "value"]), ["event_type"], fn
    )


ORACLES134["value_psi"] = """
WITH b AS (
  SELECT event_type,
         epoch_us(ts) // 86400000000 AS day,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
spans AS (
  SELECT event_type,
         MIN(day) + (MAX(day) - MIN(day)) // 2 AS mid
  FROM b GROUP BY 1
),
halves AS (
  SELECT b.event_type, b.c,
         CASE WHEN b.day <= s.mid THEN 1 ELSE 2 END AS half
  FROM b JOIN spans s USING (event_type)
),
n1s AS (
  SELECT event_type, COUNT(*) AS n1 FROM halves WHERE half = 1 GROUP BY 1
),
ranked AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn
  FROM halves WHERE half = 1
),
deciles AS (SELECT unnest(generate_series(1, 9)) AS i),
edges AS (
  SELECT r.event_type, d.i, r.c AS edge
  FROM ranked r
  JOIN n1s n USING (event_type)
  JOIN deciles d ON r.rn = (d.i * n.n1 + 9) // 10
),
bucketed AS (
  SELECT h.event_type, h.half,
         (SELECT COUNT(*) FROM edges e
          WHERE e.event_type = h.event_type AND h.c > e.edge) AS bucket
  FROM halves h
),
cnt AS (
  SELECT event_type, half, bucket, COUNT(*) AS n
  FROM bucketed GROUP BY 1, 2, 3
),
tot AS (
  SELECT event_type, half, SUM(n) AS total FROM cnt GROUP BY 1, 2
),
pairs AS (
  SELECT c1.event_type, c1.bucket,
         CAST(c1.n AS DOUBLE) / CAST(t1.total AS DOUBLE) AS p1,
         CAST(c2.n AS DOUBLE) / CAST(t2.total AS DOUBLE) AS p2
  FROM cnt c1
  JOIN cnt c2 ON c2.event_type = c1.event_type AND c2.bucket = c1.bucket
             AND c1.half = 1 AND c2.half = 2
  JOIN tot t1 ON t1.event_type = c1.event_type AND t1.half = 1
  JOIN tot t2 ON t2.event_type = c1.event_type AND t2.half = 2
)
SELECT p.event_type,
       CAST(t1.total AS BIGINT) AS n_first,
       CAST(t2.total AS BIGINT) AS n_second,
       ROUND(list_sum(list((p.p2 - p.p1) * ln(p.p2 / p.p1)
                           ORDER BY p.bucket)), 6) AS psi
FROM pairs p
JOIN tot t1 ON t1.event_type = p.event_type AND t1.half = 1
JOIN tot t2 ON t2.event_type = p.event_type AND t2.half = 2
GROUP BY 1, t1.total, t2.total
"""


# ---------------------------------------------------------------------------
# Katz word burstiness
# ---------------------------------------------------------------------------


def q_word_burstiness(sf_dir: str):
    """For the corpus's top-20 tokens (count DESC, token ASC): the
    variance-to-mean ratio of per-document occurrence counts (zeros
    included) — Katz burstiness: ~1 means Poisson-scattered function
    words, >> 1 means topically clumped content words. Power sums over
    (token, doc) counts are exact; VMR is one transcribed expression."""

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        rows_doc: list = []
        rows_tok: list = []
        for did, t in zip(
            batch["doc_id"].to_numpy(np.int64), batch["text"].fillna("")
        ):
            for w in t.split():
                rows_doc.append(int(did))
                rows_tok.append(w)
        return pd.DataFrame(
            {
                "token": rows_tok,
                "doc_id": np.array(rows_doc, dtype=np.int64),
                "n": np.ones(len(rows_tok), dtype=np.int64),
            }
        )

    pairs = hash_bucket_aggregate(
        _documents(sf_dir, ["doc_id", "text"]).map_batches(
            toks, batch_format="pandas"
        ),
        ["token", "doc_id"],
        [("n", "sum")],
    )

    def powers(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_sum"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "token": batch["token"],
                    "docs": np.ones(len(batch), dtype=np.int64),
                    "s": n,
                    "ss": n * n,
                }
            )
            .groupby("token", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        pairs.map_batches(powers, batch_format="pandas"),
        ["token"],
        [("docs", "sum"), ("s", "sum"), ("ss", "sum")],
    ).to_pandas()
    n_docs = int(_documents(sf_dir, ["doc_id"]).count())
    top = agg.sort_values(["s_sum", "token"], ascending=[False, True]).head(
        BURST_TOP_K
    )
    rows = []
    for _, r in top.iterrows():
        s = int(r["s_sum"])
        ss = int(r["ss_sum"])
        mean = float(s) / float(n_docs)
        var = float(ss) / float(n_docs) - mean * mean
        rows.append(
            (
                r["token"],
                s,
                int(r["docs_sum"]),
                float(_r6away(mean)),
                float(_r6away(var / mean)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["token", "n_occurrences", "n_docs_with", "mean_per_doc",
                 "burstiness"],
    ).astype({"n_occurrences": np.int64, "n_docs_with": np.int64})


ORACLES134["word_burstiness"] = f"""
WITH t AS (
  SELECT doc_id,
         unnest(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
pd_counts AS (
  SELECT token, doc_id, COUNT(*) AS n FROM t GROUP BY 1, 2
),
g AS (
  SELECT token, COUNT(*) AS docs, CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(CAST(n AS HUGEINT) * n) AS HUGEINT) AS ss
  FROM pd_counts GROUP BY 1
),
nd AS (SELECT COUNT(*) AS n_docs FROM documents),
top AS (
  SELECT token, docs, s, ss FROM g
  QUALIFY ROW_NUMBER() OVER (ORDER BY s DESC, token ASC) <= {BURST_TOP_K}
)
SELECT t.token, CAST(t.s AS BIGINT) AS n_occurrences,
       CAST(t.docs AS BIGINT) AS n_docs_with,
       ROUND(CAST(t.s AS DOUBLE) / CAST(nd.n_docs AS DOUBLE), 6)
         AS mean_per_doc,
       ROUND((CAST(t.ss AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)
              - (CAST(t.s AS DOUBLE) / CAST(nd.n_docs AS DOUBLE))
                * (CAST(t.s AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)))
             / (CAST(t.s AS DOUBLE) / CAST(nd.n_docs AS DOUBLE)), 6)
         AS burstiness
FROM top t CROSS JOIN nd
"""


# ---------------------------------------------------------------------------
# Rolling-origin SES backtest
# ---------------------------------------------------------------------------


def q_ses_backtest(sf_dir: str):
    """Per event_type over the dense daily count series: rolling-origin
    one-step backtest of SES (alpha = 0.3, level seeded at y0) — at
    every origin t the forecast for t+1 is the level after absorbing
    y_0..y_t; report the SES MAE, the naive (y_hat = y_t) MAE, and
    their ratio (< 1 = smoothing helps). The level recurrence is
    transcribed op-for-op against a recursive CTE; error folds run in
    ascending origin order; the naive MAE is exact-integer."""
    agg = _daily_counts(sf_dir)
    lo = int(agg["day_us"].min())
    hi = int(agg["day_us"].max())
    grid = np.arange(lo, hi + DAY_US, DAY_US, dtype=np.int64)
    n = int(grid.size)
    rows = []
    for t in sorted(agg["event_type"].unique()):
        g = agg[agg["event_type"] == t]
        v = np.zeros(n, dtype=np.int64)
        v[(g["day_us"].to_numpy(np.int64) - lo) // DAY_US] = g[
            "n_sum"
        ].to_numpy(np.int64)
        if n < 2:
            continue
        level = float(v[0])
        err = 0.0
        for i in range(0, n - 1):  # ascending origins
            if i > 0:
                level = 0.3 * float(v[i]) + 0.7 * level
            err = err + abs(level - float(v[i + 1]))
        naive = int(np.abs(v[1:] - v[:-1]).sum())
        if naive == 0:
            continue
        m = n - 1
        mae = err / float(m)
        nmae = float(naive) / float(m)
        rows.append(
            (
                t,
                m,
                float(_r6away(mae)),
                float(_r6away(nmae)),
                float(_r6away(mae / nmae)),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "n_origins", "ses_mae", "naive_mae",
                 "mae_ratio"],
    ).astype({"n_origins": np.int64})


ORACLES134["ses_backtest"] = """
WITH RECURSIVE d AS (
  SELECT event_type, date_trunc('day', ts) AS bd, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bd) AS lo, MAX(bd) AS hi FROM d),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bd FROM bounds
),
types AS (SELECT DISTINCT event_type FROM d),
dense AS MATERIALIZED (
  SELECT t.event_type, g.bd,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bd) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(d.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN d ON d.event_type = t.event_type AND d.bd = g.bd
),
rec AS (
  SELECT event_type, idx, CAST(x AS DOUBLE) AS level
  FROM dense WHERE idx = 0
  UNION ALL
  SELECT b.event_type, b.idx,
         CAST(0.3 AS DOUBLE) * CAST(b.x AS DOUBLE)
           + CAST(0.7 AS DOUBLE) * rec.level
  FROM rec JOIN dense b
    ON b.event_type = rec.event_type AND b.idx = rec.idx + 1
),
errs AS (
  SELECT r.event_type, r.idx, abs(r.level - CAST(nx.x AS DOUBLE)) AS e,
         abs(nx.x - cur.x) AS ne
  FROM rec r
  JOIN dense nx ON nx.event_type = r.event_type AND nx.idx = r.idx + 1
  JOIN dense cur ON cur.event_type = r.event_type AND cur.idx = r.idx
),
s AS (
  SELECT event_type, COUNT(*) AS m,
         list_sum(list(e ORDER BY idx)) AS err,
         CAST(SUM(ne) AS BIGINT) AS naive
  FROM errs GROUP BY 1
)
SELECT event_type, CAST(m AS BIGINT) AS n_origins,
       ROUND(err / CAST(m AS DOUBLE), 6) AS ses_mae,
       ROUND(CAST(naive AS DOUBLE) / CAST(m AS DOUBLE), 6) AS naive_mae,
       ROUND((err / CAST(m AS DOUBLE))
             / (CAST(naive AS DOUBLE) / CAST(m AS DOUBLE)), 6) AS mae_ratio
FROM s WHERE naive > 0
"""


QUERIES134["value_psi"] = q_value_psi
QUERIES134["word_burstiness"] = q_word_burstiness
QUERIES134["ses_backtest"] = q_ses_backtest
