"""Round-3 batch 19: long-memory and stream-law diagnostics — detrended
fluctuation analysis (DFA, the detrended twin of hurst_rs: per-window
linear fits of the integrated load profile, fluctuation log-log slope),
Simpson diversity of the vocabulary per source (effective vocabulary
size 1/sum p_i^2 as an exact integer ratio), stopword coverage per
source (fixed bounded list, exact counts), and an exponential
goodness-of-fit KS statistic over per-type inter-arrival gaps (is the
stream Poisson?).

House parity: the DFA profile is built from exact int64 prefix sums and
a single global mean; per-window regression moments Sj/Sjj are
closed-form integers while the SY/SjY/residual reductions run as
ascending-j left-folds (list_sum contract), per-window-size fluctuations
anchor at ROUND(,6) before the log-log slope (iqr_outliers pattern);
Simpson's numerator sum(m*(m-1)) and denominator T*(T-1) are exact
integers cast to double once; the exponential CDF uses scalar math.exp
(libm == DuckDB exp bitwise — numpy's SIMD exp is NOT used) over exact
integer gaps with rank-based ECDF bounds.

Scale contracts: hourly profiles are retention-bounded; token counts
reduce through one (source, token) exchange; the gap KS runs per type
through bucketed_map_groups (the quantiles contract) and its only
driver state is one row per type.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries14 import HURST_WINDOWS, _dense_totals, _fold
from .queries16 import _TOKEN_RE

QUERIES17: dict = {}
ORACLES17: dict = {}

STOPWORDS = (
    "the", "of", "and", "to", "a", "in", "is", "it", "that", "for",
    "on", "was", "with", "as", "at", "by", "this", "are", "be", "or",
)


# ---------------------------------------------------------------------------
# Detrended fluctuation analysis
# ---------------------------------------------------------------------------


def q_dfa(sf_dir: str):
    """DFA of total hourly load: integrate deviations from the global
    mean into a profile, fit a straight line per non-overlapping window
    of W in {24,48,96} hours, and regress ln(RMS residual) on ln(W) —
    alpha ~ 0.5 is uncorrelated noise, > 1 is persistent trend-dominated
    load. Unlike hurst_rs this removes per-window linear trends, so the
    two together separate 'real long memory' from 'just trending'."""
    v = _dense_totals(sf_dir)
    n = v.size
    s = int(v.sum())
    mu = float(s) / float(n)
    c = np.cumsum(v)
    prof = [float(int(c[k - 1])) - float(k) * mu for k in range(1, n + 1)]
    pts = []
    for w in HURST_WINDOWS:
        nw = n // w
        if nw < 1:
            continue
        sj = w * (w + 1) // 2
        sjj = w * (w + 1) * (2 * w + 1) // 6
        wf, sjf, sjjf = float(w), float(sj), float(sjj)
        den = wf * sjjf - sjf * sjf
        f2s = []
        for wid in range(nw):
            seg = prof[wid * w : (wid + 1) * w]
            sy = _fold(seg)
            sjy = _fold([float(j) * seg[j - 1] for j in range(1, w + 1)])
            b = (wf * sjy - sjf * sy) / den
            a = (sy - b * sjf) / wf
            f2 = _fold(
                [
                    (seg[j - 1] - (a + b * float(j)))
                    * (seg[j - 1] - (a + b * float(j)))
                    for j in range(1, w + 1)
                ]
            ) / wf
            f2s.append(f2)
        fluct = math.sqrt(_fold(f2s) / float(nw))
        pts.append((w, nw, float(_r6away(fluct))))
    xs = [math.log(float(w)) for w, _, _ in pts]
    ys = [math.log(f) for _, _, f in pts]
    m = float(len(pts))
    xbar = _fold(xs) / m
    ybar = _fold(ys) / m
    sxy = _fold([(x - xbar) * (y - ybar) for x, y in zip(xs, ys)])
    sxx = _fold([(x - xbar) * (x - xbar) for x in xs])
    alpha = float(_r6away(sxy / sxx))
    return pd.DataFrame(
        [(w, nw, f, alpha) for (w, nw, f) in pts],
        columns=["window_h", "n_windows", "fluct", "dfa_alpha"],
    ).astype({"window_h": np.int64, "n_windows": np.int64})


ORACLES17["dfa"] = """
WITH h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
dense AS (
  SELECT CAST(COALESCE(h.n, 0) AS BIGINT) AS v,
         ROW_NUMBER() OVER (ORDER BY g.bh) AS k
  FROM grid g LEFT JOIN h USING (bh)
),
stats AS (
  SELECT COUNT(*) AS n, CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu
  FROM dense
),
prof AS (
  SELECT d.k,
         CAST(SUM(d.v) OVER (ORDER BY d.k) AS DOUBLE)
           - CAST(d.k AS DOUBLE) * st.mu AS y
  FROM dense d CROSS JOIN stats st
),
ws AS (SELECT unnest([24, 48, 96]) AS w),
assigned AS (
  SELECT ws.w, (p.k - 1) // ws.w AS wid, (p.k - 1) % ws.w + 1 AS j, p.y
  FROM prof p CROSS JOIN ws, stats st
  WHERE p.k - 1 < (st.n // ws.w) * ws.w
),
m1 AS (
  SELECT w, wid,
         list_sum(list(y ORDER BY j)) AS sy,
         list_sum(list(CAST(j AS DOUBLE) * y ORDER BY j)) AS sjy
  FROM assigned GROUP BY w, wid
),
fit AS (
  SELECT w, wid, sy, sjy,
         (CAST(w AS DOUBLE) * sjy
          - CAST(w * (w + 1) // 2 AS DOUBLE) * sy)
           / (CAST(w AS DOUBLE) * CAST(w * (w + 1) * (2 * w + 1) // 6 AS DOUBLE)
              - CAST(w * (w + 1) // 2 AS DOUBLE)
                * CAST(w * (w + 1) // 2 AS DOUBLE)) AS b
  FROM m1
),
fit2 AS (
  SELECT w, wid, b,
         (sy - b * CAST(w * (w + 1) // 2 AS DOUBLE)) / CAST(w AS DOUBLE) AS a
  FROM fit
),
resid AS (
  SELECT s.w, s.wid,
         list_sum(list((s.y - (f.a + f.b * CAST(s.j AS DOUBLE)))
                       * (s.y - (f.a + f.b * CAST(s.j AS DOUBLE)))
                       ORDER BY s.j)) / CAST(s.w AS DOUBLE) AS f2
  FROM assigned s JOIN fit2 f ON f.w = s.w AND f.wid = s.wid
  GROUP BY s.w, s.wid
),
per_w AS (
  SELECT w, COUNT(*) AS n_windows,
         ROUND(sqrt(list_sum(list(f2 ORDER BY wid))
                    / CAST(COUNT(*) AS DOUBLE)), 6) AS fluct
  FROM resid GROUP BY w
),
pts AS (
  SELECT w, n_windows, fluct,
         ln(CAST(w AS DOUBLE)) AS x, ln(fluct) AS y
  FROM per_w
),
mm1 AS (
  SELECT list_sum(list(x ORDER BY w)) / CAST(COUNT(*) AS DOUBLE) AS xbar,
         list_sum(list(y ORDER BY w)) / CAST(COUNT(*) AS DOUBLE) AS ybar
  FROM pts
),
mm2 AS (
  SELECT list_sum(list((p.x - mm1.xbar) * (p.y - mm1.ybar) ORDER BY p.w)) AS sxy,
         list_sum(list((p.x - mm1.xbar) * (p.x - mm1.xbar) ORDER BY p.w)) AS sxx
  FROM pts p, mm1
)
SELECT CAST(p.w AS BIGINT) AS window_h,
       CAST(p.n_windows AS BIGINT) AS n_windows,
       p.fluct,
       ROUND(mm2.sxy / mm2.sxx, 6) AS dfa_alpha
FROM pts p, mm2
"""


# ---------------------------------------------------------------------------
# Simpson diversity (effective vocabulary size) per source
# ---------------------------------------------------------------------------


def _per_token_counts(sf_dir: str):
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for src, text in zip(batch["source"], batch["text"]):
            for tok in _TOKEN_RE.findall((text or "").lower()):
                key = (src, tok)
                rows[key] = rows.get(key, 0) + 1
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "tok": [k[1] for k in keys],
                "m": np.array([rows[k] for k in keys], dtype=np.int64),
            }
        )

    return hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "tok"],
        [("m", "sum")],
    )


def q_simpson_diversity(sf_dir: str):
    """Per source: Simpson concentration sum(m(m-1))/(T(T-1)) of the
    token distribution and its inverse — the 'effective vocabulary
    size' (how many equally-likely tokens would look this diverse).
    Both the numerator and denominator are EXACT integers (Python
    bigints / HUGEINT), cast to double once for the final division."""
    per_tok = _per_token_counts(sf_dir)
    partial2 = per_tok.map_batches(
        lambda b: pd.DataFrame(
            {
                "source": b["source"],
                "v": np.ones(len(b), dtype=np.int64),
                "t": b["m_sum"].astype(np.int64),
                "mm": (
                    b["m_sum"].astype(np.int64)
                    * (b["m_sum"].astype(np.int64) - 1)
                ),
            }
        ),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        partial2, ["source"], [("v", "sum"), ("t", "sum"), ("mm", "sum")]
    ).to_pandas()
    rows = []
    for i in range(len(agg)):
        t = int(agg["t_sum"].iloc[i])
        num = int(agg["mm_sum"].iloc[i])
        den = t * (t - 1)
        simpson = float(num) / float(den)
        eff = float(den) / float(num)
        rows.append(
            (
                agg["source"].iloc[i],
                t,
                int(agg["v_sum"].iloc[i]),
                float(_r6away(simpson)),
                float(_r6away(eff)),
            )
        )
    return (
        pd.DataFrame(
            rows,
            columns=["source", "n_tokens", "vocab", "simpson", "effective_vocab"],
        )
        .astype({"n_tokens": np.int64, "vocab": np.int64})
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES17["simpson_diversity"] = """
WITH t AS (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
c AS (SELECT source, tok, COUNT(*) AS m FROM t GROUP BY 1, 2),
a AS (
  SELECT source,
         CAST(SUM(m) AS BIGINT) AS t_total,
         COUNT(*) AS v,
         SUM(m::HUGEINT * (m - 1)::HUGEINT) AS num
  FROM c GROUP BY 1
)
SELECT source,
       t_total AS n_tokens,
       CAST(v AS BIGINT) AS vocab,
       ROUND(CAST(num AS DOUBLE)
             / CAST(t_total::HUGEINT * (t_total - 1)::HUGEINT AS DOUBLE), 6)
         AS simpson,
       ROUND(CAST(t_total::HUGEINT * (t_total - 1)::HUGEINT AS DOUBLE)
             / CAST(num AS DOUBLE), 6) AS effective_vocab
FROM a
"""


# ---------------------------------------------------------------------------
# Stopword coverage per source
# ---------------------------------------------------------------------------


def q_stopword_coverage(sf_dir: str):
    """Per source: fraction of tokens that are one of a fixed 20-word
    English stopword list — the cheap natural-English-vs-boilerplate
    gauge in the quality family. Counts are exact integers through one
    exchange; the list is a bounded broadcast constant."""
    docs = _documents(sf_dir, ["source", "text"])
    stop = frozenset(STOPWORDS)

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        srcs, tot, hit = [], [], []
        for src, text in zip(batch["source"], batch["text"]):
            toks = _TOKEN_RE.findall((text or "").lower())
            srcs.append(src)
            tot.append(len(toks))
            hit.append(sum(1 for tk in toks if tk in stop))
        return pd.DataFrame(
            {
                "source": srcs,
                "t": np.array(tot, dtype=np.int64),
                "k": np.array(hit, dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"],
        [("t", "sum"), ("k", "sum")],
    ).to_pandas()
    cov = [
        float(_r6away(float(int(k)) / float(int(t))))
        for k, t in zip(agg["k_sum"], agg["t_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "source": agg["source"],
                "n_tokens": agg["t_sum"].astype(np.int64),
                "n_stopwords": agg["k_sum"].astype(np.int64),
                "coverage": cov,
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in STOPWORDS)

ORACLES17["stopword_coverage"] = f"""
WITH t AS (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
a AS (
  SELECT source,
         COUNT(*) AS t_total,
         COUNT(*) FILTER (WHERE tok IN ({_STOP_SQL})) AS k
  FROM t GROUP BY 1
)
SELECT source,
       CAST(t_total AS BIGINT) AS n_tokens,
       CAST(k AS BIGINT) AS n_stopwords,
       ROUND(CAST(k AS DOUBLE) / CAST(t_total AS DOUBLE), 6) AS coverage
FROM a
"""


# ---------------------------------------------------------------------------
# Exponential goodness-of-fit over inter-arrival gaps
# ---------------------------------------------------------------------------


def q_exp_gof(sf_dir: str):
    """Per event type: the KS distance between the inter-arrival gap
    ECDF and the fitted exponential (rate = n/sum(gaps)) — 'is this
    stream Poisson?'. Gaps are exact integer microseconds ordered by
    (ts, event_id); the exponential CDF runs through scalar math.exp
    (libm == DuckDB exp); D is a max over identically-computed
    per-rank doubles, so no summation-order surface exists."""
    ev = _events(sf_dir, ["event_id", "ts", "event_type"])

    def prep(batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "event_type": batch["event_type"],
                "ts_us": batch["ts"].to_numpy("datetime64[us]").view(np.int64),
                "event_id": batch["event_id"].astype(np.int64),
            }
        )

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts_us", "event_id"])
        gaps = np.diff(df["ts_us"].to_numpy(np.int64))
        gaps = np.sort(gaps)
        n = int(gaps.size)
        s = int(gaps.sum()) if n else 0
        if n == 0 or s <= 0:
            return pd.DataFrame(
                {
                    "event_type": [df["event_type"].iloc[0]],
                    "n_gaps": np.array([0], dtype=np.int64),
                    "rate_per_s": [0.0],
                    "ks_d": [0.0],
                }
            )
        lam = float(n) / float(s)
        nf = float(n)
        d = 0.0
        for i in range(1, n + 1):
            f = 1.0 - math.exp(-(lam * float(int(gaps[i - 1]))))
            lo = f - (float(i) - 1.0) / nf
            hi = float(i) / nf - f
            step = lo if lo > hi else hi
            d = step if step > d else d
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_gaps": np.array([n], dtype=np.int64),
                "rate_per_s": [float(_r6away(lam * 1000000.0))],
                "ks_d": [float(_r6away(d))],
            }
        )

    return bucketed_map_groups(
        ev.map_batches(prep, batch_format="pandas"), ["event_type"], kernel
    )


ORACLES17["exp_gof"] = """
WITH s AS (
  SELECT event_type,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
),
g AS (SELECT event_type, gap FROM s WHERE gap IS NOT NULL),
a AS (
  SELECT event_type, COUNT(*) AS n, CAST(SUM(gap) AS BIGINT) AS ssum
  FROM g GROUP BY 1
  HAVING COUNT(*) > 0 AND CAST(SUM(gap) AS BIGINT) > 0
),
r AS (
  SELECT g.event_type, g.gap, a.n, a.ssum,
         ROW_NUMBER() OVER (PARTITION BY g.event_type ORDER BY g.gap) AS i
  FROM g JOIN a USING (event_type)
),
d AS (
  SELECT event_type, n, ssum,
         MAX(GREATEST(
           (1.0 - exp(-((CAST(n AS DOUBLE) / CAST(ssum AS DOUBLE))
                        * CAST(gap AS DOUBLE))))
             - (CAST(i AS DOUBLE) - 1.0) / CAST(n AS DOUBLE),
           CAST(i AS DOUBLE) / CAST(n AS DOUBLE)
             - (1.0 - exp(-((CAST(n AS DOUBLE) / CAST(ssum AS DOUBLE))
                            * CAST(gap AS DOUBLE))))
         )) AS ks
  FROM r GROUP BY event_type, n, ssum
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND((CAST(n AS DOUBLE) / CAST(ssum AS DOUBLE)) * 1000000.0, 6)
         AS rate_per_s,
       ROUND(ks, 6) AS ks_d
FROM d
"""


QUERIES17["dfa"] = q_dfa
QUERIES17["simpson_diversity"] = q_simpson_diversity
QUERIES17["stopword_coverage"] = q_stopword_coverage
QUERIES17["exp_gof"] = q_exp_gof
