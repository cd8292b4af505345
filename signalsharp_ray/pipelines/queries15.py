"""Round-3 batch 17: drift / control-chart detectors and two corpus
statistics — the Page-Hinkley mean-drift detector replayed exactly over
the hourly load (running-mean cumulative deviation with min tracking),
an EWMA control chart with exact time-varying limits (the (1-lambda)^2t
term carried as a recursion state so no pow() parity surface exists),
Flesch-style readability per source (regex token / sentence / vowel-group
counts — exact integers), and the exact covariance matrix of the
embedding table over ROUND-quantized micro-unit integers.

House parity: both detectors are float recursions transcribed op-for-op
against recursive CTEs (the token_bucket/ema contract) whose per-step
ingredients are exact int64 prefix sums; readability counts use the SAME
regex patterns through Python re and DuckDB RE2 (ASCII corpus) and
reduce as exact integer sums; covariance numerators are exact integer
sums of quantized products (HUGEINT on the SQL side), descaled by one
transcribed float expression. Every float literal on the SQL side is
CAST(... AS DOUBLE) so DuckDB never infers DECIMAL.

Scale contracts: detectors fold a retention-bounded hourly profile
(~720 rows); readability counts reduce through one per-source exchange;
covariance partials are d(d+1)/2-bounded Gram matrices per batch
(one exchange of dimension-pair rows, never the vector table).
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries14 import _dense_totals

QUERIES15: dict = {}
ORACLES15: dict = {}

PH_DELTA = 5.0
PH_LAMBDA = 100.0
EWMA_LAM = 0.2

_WORD_RE = re.compile(r"\S+")
_SENT_RE = re.compile(r"[.!?]+")
_VOWEL_RE = re.compile(r"[aeiouy]+")


# ---------------------------------------------------------------------------
# Page-Hinkley mean-drift detector
# ---------------------------------------------------------------------------


def q_page_hinkley(sf_dir: str):
    """Page-Hinkley drift detector replayed over total hourly load on
    the dense grid: m_t = m_{t-1} + (x_t - mean_t - delta) with mean_t
    the exact running mean C_t/t, alarm whenever m_t exceeds its own
    running minimum by lambda. The integer prefix sum C_t is exact;
    each float step is transcribed op-for-op against the recursive-CTE
    oracle."""
    v = _dense_totals(sf_dir)
    c = int(v[0])
    m = float(v[0]) - float(c) / 1.0 - PH_DELTA
    mmin = m
    alarms = 1 if m - mmin > PH_LAMBDA else 0
    for t in range(2, v.size + 1):
        x = int(v[t - 1])
        c = c + x
        term = float(x) - float(c) / float(t) - PH_DELTA
        m = m + term
        mmin = m if m < mmin else mmin
        alarms += 1 if m - mmin > PH_LAMBDA else 0
    return pd.DataFrame(
        {
            "n_hours": np.array([v.size], dtype=np.int64),
            "ph_final": [float(_r6away(m))],
            "ph_min": [float(_r6away(mmin))],
            "n_alarms": np.array([alarms], dtype=np.int64),
        }
    )


ORACLES15["page_hinkley"] = f"""
WITH RECURSIVE h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
base AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY g.bh) - 1 AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS v
  FROM grid g LEFT JOIN h USING (bh)
),
rec AS (
  SELECT idx, v AS c,
         CAST(v AS DOUBLE) - CAST(v AS DOUBLE) / 1.0
           - CAST({PH_DELTA} AS DOUBLE) AS m,
         CAST(v AS DOUBLE) - CAST(v AS DOUBLE) / 1.0
           - CAST({PH_DELTA} AS DOUBLE) AS mmin,
         0 AS alarms
  FROM base WHERE idx = 0
  UNION ALL
  SELECT b.idx, rec.c + b.v,
         rec.m + (CAST(b.v AS DOUBLE)
                  - CAST(rec.c + b.v AS DOUBLE) / CAST(b.idx + 1 AS DOUBLE)
                  - CAST({PH_DELTA} AS DOUBLE)),
         least(rec.mmin,
               rec.m + (CAST(b.v AS DOUBLE)
                        - CAST(rec.c + b.v AS DOUBLE) / CAST(b.idx + 1 AS DOUBLE)
                        - CAST({PH_DELTA} AS DOUBLE))),
         rec.alarms + CASE
           WHEN rec.m + (CAST(b.v AS DOUBLE)
                         - CAST(rec.c + b.v AS DOUBLE) / CAST(b.idx + 1 AS DOUBLE)
                         - CAST({PH_DELTA} AS DOUBLE))
                - least(rec.mmin,
                        rec.m + (CAST(b.v AS DOUBLE)
                                 - CAST(rec.c + b.v AS DOUBLE)
                                   / CAST(b.idx + 1 AS DOUBLE)
                                 - CAST({PH_DELTA} AS DOUBLE)))
                > CAST({PH_LAMBDA} AS DOUBLE)
           THEN 1 ELSE 0 END
  FROM rec JOIN base b ON b.idx = rec.idx + 1
)
SELECT CAST(idx + 1 AS BIGINT) AS n_hours,
       ROUND(m, 6) AS ph_final,
       ROUND(mmin, 6) AS ph_min,
       CAST(alarms AS BIGINT) AS n_alarms
FROM rec ORDER BY idx DESC LIMIT 1
"""


# ---------------------------------------------------------------------------
# EWMA control chart
# ---------------------------------------------------------------------------


def q_ewma_control(sf_dir: str):
    """EWMA control chart over total hourly load: z_t = lam*x_t +
    (1-lam)*z_{t-1} anchored at the exact global mean, with the exact
    time-varying 3-sigma limit width 3*sd*sqrt(lam/(2-lam)*(1-(1-lam)^2t)).
    The (1-lam)^2t factor is carried as a recursion state p_t =
    p_{t-1}*(1-lam)^2 so there is no pow() parity surface; mean and sd
    come from exact integer S/SS."""
    v = _dense_totals(sf_dir)
    n = v.size
    s = int(v.sum())
    ss = int((v * v).sum())
    mu = float(s) / float(n)
    var = float(ss) / float(n) - mu * mu
    sd = math.sqrt(var)
    lam = EWMA_LAM
    q = (1.0 - lam) * (1.0 - lam)
    z = mu
    p = 1.0
    viol = 0
    for t in range(1, n + 1):
        x = int(v[t - 1])
        z = lam * float(x) + (1.0 - lam) * z
        p = p * q
        width = 3.0 * sd * math.sqrt(lam / (2.0 - lam) * (1.0 - p))
        viol += 1 if abs(z - mu) > width else 0
    return pd.DataFrame(
        {
            "n_hours": np.array([n], dtype=np.int64),
            "z_final": [float(_r6away(z))],
            "sd": [float(_r6away(sd))],
            "n_violations": np.array([viol], dtype=np.int64),
        }
    )


ORACLES15["ewma_control"] = f"""
WITH RECURSIVE h AS (
  SELECT date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
base AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY g.bh) - 1 AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS v
  FROM grid g LEFT JOIN h USING (bh)
),
stats AS MATERIALIZED (
  SELECT COUNT(*) AS n,
         CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mu,
         sqrt(CAST(SUM(v * v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
              - (CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                * (CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))) AS sd
  FROM base
),
rec AS (
  SELECT CAST(-1 AS BIGINT) AS idx, s.mu AS z, CAST(1.0 AS DOUBLE) AS p,
         0 AS viol
  FROM stats s
  UNION ALL
  SELECT b.idx,
         CAST({EWMA_LAM} AS DOUBLE) * CAST(b.v AS DOUBLE)
           + (1.0 - CAST({EWMA_LAM} AS DOUBLE)) * rec.z,
         rec.p * ((1.0 - CAST({EWMA_LAM} AS DOUBLE))
                  * (1.0 - CAST({EWMA_LAM} AS DOUBLE))),
         rec.viol + CASE
           WHEN abs(CAST({EWMA_LAM} AS DOUBLE) * CAST(b.v AS DOUBLE)
                    + (1.0 - CAST({EWMA_LAM} AS DOUBLE)) * rec.z - s.mu)
                > 3.0 * s.sd
                  * sqrt(CAST({EWMA_LAM} AS DOUBLE)
                         / (2.0 - CAST({EWMA_LAM} AS DOUBLE))
                         * (1.0 - rec.p * ((1.0 - CAST({EWMA_LAM} AS DOUBLE))
                                           * (1.0 - CAST({EWMA_LAM} AS DOUBLE)))))
           THEN 1 ELSE 0 END
  FROM rec JOIN base b ON b.idx = rec.idx + 1
  CROSS JOIN stats s
)
SELECT CAST(r.idx + 1 AS BIGINT) AS n_hours,
       ROUND(r.z, 6) AS z_final,
       ROUND(s.sd, 6) AS sd,
       CAST(r.viol AS BIGINT) AS n_violations
FROM rec r CROSS JOIN stats s
ORDER BY r.idx DESC LIMIT 1
"""


# ---------------------------------------------------------------------------
# Flesch-style readability per source
# ---------------------------------------------------------------------------


def q_readability(sf_dir: str):
    """Per source: Flesch-style reading ease 206.835 - 1.015*(W/S) -
    84.6*(V/W) from exact regex counts — words = \\S+ runs, sentences =
    [.!?]+ runs clamped to >= 1 per doc, syllable proxy = [aeiouy]+
    vowel groups of the lowercased text. Same patterns through Python
    re and DuckDB RE2 (ASCII corpus); per-source sums are exact
    integers through one exchange; the score is one transcribed
    expression."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        srcs, w, s, vg = [], [], [], []
        for src, text in zip(batch["source"], batch["text"]):
            t = text or ""
            srcs.append(src)
            w.append(len(_WORD_RE.findall(t)))
            s.append(max(1, len(_SENT_RE.findall(t))))
            vg.append(len(_VOWEL_RE.findall(t.lower())))
        return pd.DataFrame(
            {
                "source": srcs,
                "d": np.ones(len(srcs), dtype=np.int64),
                "w": np.array(w, dtype=np.int64),
                "s": np.array(s, dtype=np.int64),
                "v": np.array(vg, dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"],
        [("d", "sum"), ("w", "sum"), ("s", "sum"), ("v", "sum")],
    ).to_pandas()
    w = agg["w_sum"].astype(np.int64)
    s = agg["s_sum"].astype(np.int64)
    v = agg["v_sum"].astype(np.int64)
    rows = []
    for i in range(len(agg)):
        wi, si, vi = float(int(w.iloc[i])), float(int(s.iloc[i])), float(int(v.iloc[i]))
        score = 206.835 - 1.015 * (wi / si) - 84.6 * (vi / wi)
        rows.append(
            (
                agg["source"].iloc[i],
                int(agg["d_sum"].iloc[i]),
                int(w.iloc[i]),
                int(s.iloc[i]),
                int(v.iloc[i]),
                float(_r6away(score)),
            )
        )
    return (
        pd.DataFrame(
            rows,
            columns=["source", "n_docs", "n_words", "n_sentences", "n_syllables",
                     "flesch"],
        )
        .astype(
            {
                "n_docs": np.int64,
                "n_words": np.int64,
                "n_sentences": np.int64,
                "n_syllables": np.int64,
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES15["readability"] = """
WITH d AS (
  SELECT source,
         len(regexp_extract_all(text, '\\S+')) AS w,
         GREATEST(1, len(regexp_extract_all(text, '[.!?]+'))) AS s,
         len(regexp_extract_all(lower(text), '[aeiouy]+')) AS v
  FROM documents
),
a AS (
  SELECT source, COUNT(*) AS n_docs,
         CAST(SUM(w) AS BIGINT) AS w,
         CAST(SUM(s) AS BIGINT) AS s,
         CAST(SUM(v) AS BIGINT) AS v
  FROM d GROUP BY 1
)
SELECT source, n_docs, w AS n_words, s AS n_sentences, v AS n_syllables,
       ROUND(CAST(206.835 AS DOUBLE)
             - CAST(1.015 AS DOUBLE) * (CAST(w AS DOUBLE) / CAST(s AS DOUBLE))
             - CAST(84.6 AS DOUBLE) * (CAST(v AS DOUBLE) / CAST(w AS DOUBLE)), 6)
         AS flesch
FROM a
"""


# ---------------------------------------------------------------------------
# Exact embedding covariance matrix
# ---------------------------------------------------------------------------


def q_embedding_covariance(sf_dir: str):
    """Upper-triangle covariance matrix of the embedding table over
    micro-unit quantized integers q = round_half_away(x * 1e6): the
    Gram numerators are EXACT integer sums (each batch contributes one
    d x d int64 Gram matrix; only d(d+1)/2 pair rows cross the
    exchange, never vectors), and the covariance is one transcribed
    float expression (S_ij - S_i S_j / n) / n descaled by 1e12."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        mat = np.vstack(batch["embedding"].to_numpy()).astype(np.float64)
        y = mat * 1e6
        q = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        d = q.shape[1]
        g = q.T @ q
        iu = np.triu_indices(d)
        pair = pd.DataFrame(
            {
                "dim_i": iu[0].astype(np.int64),
                "dim_j": iu[1].astype(np.int64),
                "acc": g[iu],
            }
        )
        sums = pd.DataFrame(
            {
                "dim_i": np.arange(d, dtype=np.int64),
                "dim_j": np.full(d, -1, dtype=np.int64),
                "acc": q.sum(axis=0),
            }
        )
        cnt = pd.DataFrame(
            {
                "dim_i": np.array([-1], dtype=np.int64),
                "dim_j": np.array([-1], dtype=np.int64),
                "acc": np.array([q.shape[0]], dtype=np.int64),
            }
        )
        return pd.concat([pair, sums, cnt], ignore_index=True)

    agg = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["dim_i", "dim_j"],
        [("acc", "sum")],
    ).to_pandas()
    n = int(agg.loc[(agg.dim_i == -1) & (agg.dim_j == -1), "acc_sum"].iloc[0])
    dim_sums = (
        agg[(agg.dim_j == -1) & (agg.dim_i >= 0)]
        .set_index("dim_i")["acc_sum"]
        .astype(np.int64)
    )
    pairs = agg[(agg.dim_i >= 0) & (agg.dim_j >= 0)].sort_values(["dim_i", "dim_j"])
    si = dim_sums.loc[pairs["dim_i"]].to_numpy(np.float64)
    sj = dim_sums.loc[pairs["dim_j"]].to_numpy(np.float64)
    sij = pairs["acc_sum"].to_numpy(np.int64)
    cov = (sij.astype(np.float64) - si * sj / float(n)) / float(n) / 1.0e12
    return pd.DataFrame(
        {
            "dim_i": pairs["dim_i"].to_numpy(np.int64),
            "dim_j": pairs["dim_j"].to_numpy(np.int64),
            "n_vecs": np.full(len(pairs), n, dtype=np.int64),
            "sum_ij": sij,
            "cov": _r6away(cov),
        }
    )


ORACLES15["embedding_covariance"] = """
WITH e AS (
  SELECT vec_id,
         unnest(range(0, len(embedding))) AS i,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings
),
p AS (
  SELECT a.i AS dim_i, b.i AS dim_j,
         COUNT(*) AS n,
         CAST(SUM(a.q * b.q) AS BIGINT) AS sij,
         CAST(SUM(a.q) AS BIGINT) AS si,
         CAST(SUM(b.q) AS BIGINT) AS sj
  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
  GROUP BY 1, 2
)
SELECT CAST(dim_i AS BIGINT) AS dim_i,
       CAST(dim_j AS BIGINT) AS dim_j,
       CAST(n AS BIGINT) AS n_vecs,
       sij AS sum_ij,
       ROUND((CAST(sij AS DOUBLE)
              - CAST(si AS DOUBLE) * CAST(sj AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE) / 1000000000000.0, 6) AS cov
FROM p
"""


QUERIES15["page_hinkley"] = q_page_hinkley
QUERIES15["ewma_control"] = q_ewma_control
QUERIES15["readability"] = q_readability
QUERIES15["embedding_covariance"] = q_embedding_covariance
