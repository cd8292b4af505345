"""Round-3 batch 37: stability and independence diagnostics — the
daily mean-value OLS trend (is average transaction value drifting, in
cents/day over exact integer ingredients), the language x source
chi-square independence test (is the language mix uniform across
sources — the categorical twin of corpus_mix_report), and day-profile
self-similarity (mean Pearson correlation between every pair of daily
24-hour load profiles — how templated the daily rhythm is).

House parity: the OLS trend folds (t - tbar)(y - ybar) over ascending
day with y the per-day mean from exact centivalue sums; chi-square
cells use exact integer margins with e = row*col/total transcribed and
folded over ascending (lang, source); per-day-pair Pearson combines
exact integer power sums over the 24 matched hours (pairs with a
zero-variance member excluded identically) and the outer mean folds
over ascending (day_i, day_j).

Scale contracts: daily tables are retention-bounded; the categorical
table is langs x sources; day pairs are (days choose 2)-bounded with
24-hour inner joins.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries4 import _cents
from .queries14 import _fold

QUERIES35: dict = {}
ORACLES35: dict = {}

DAY_US = 86_400_000_000
HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# Daily mean-value OLS trend
# ---------------------------------------------------------------------------


def q_value_trend_daily(sf_dir: str):
    """OLS slope and intercept of the per-day mean event value (cents)
    against the day index — is the average stake drifting. Day sums
    are exact integers; each day's mean is one division; the four
    regression moments fold over ascending day."""
    ev = _events(sf_dir, ["ts", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
                "c": _cents(b["value"]),
            }
        )
        .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby("day_us", sort=False)
        .agg(n=("n", "sum"), s=("c", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(ev, ["day_us"], [("n", "sum"), ("s", "sum")])
        .to_pandas()
        .sort_values("day_us")
        .reset_index(drop=True)
    )
    lo = int(agg["day_us"].min())
    t = [(int(d) - lo) // DAY_US for d in agg["day_us"]]
    y = [
        float(int(s)) / float(int(n)) for s, n in zip(agg["s_sum"], agg["n_sum"])
    ]
    m = float(len(t))
    xbar = _fold([float(v) for v in t]) / m
    ybar = _fold(y) / m
    sxy = _fold([(float(a) - xbar) * (b - ybar) for a, b in zip(t, y)])
    sxx = _fold([(float(a) - xbar) * (float(a) - xbar) for a in t])
    slope = sxy / sxx
    intercept = ybar - slope * xbar
    return pd.DataFrame(
        {
            "n_days": np.array([len(t)], dtype=np.int64),
            "slope_c_per_day": [float(_r6away(slope))],
            "intercept_c": [float(_r6away(intercept))],
        }
    )


ORACLES35["value_trend_daily"] = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS s
  FROM events GROUP BY 1
),
lo AS (SELECT MIN(day) AS lo FROM d),
pts AS (
  SELECT CAST(date_diff('day', lo.lo, d.day) AS DOUBLE) AS t,
         CAST(d.s AS DOUBLE) / CAST(d.n AS DOUBLE) AS y,
         d.day
  FROM d CROSS JOIN lo
),
m1 AS (
  SELECT COUNT(*) AS m,
         list_sum(list(t ORDER BY day)) / CAST(COUNT(*) AS DOUBLE) AS xbar,
         list_sum(list(y ORDER BY day)) / CAST(COUNT(*) AS DOUBLE) AS ybar
  FROM pts
),
m2 AS (
  SELECT m1.m, m1.xbar, m1.ybar,
         list_sum(list((p.t - m1.xbar) * (p.y - m1.ybar) ORDER BY p.day)) AS sxy,
         list_sum(list((p.t - m1.xbar) * (p.t - m1.xbar) ORDER BY p.day)) AS sxx
  FROM pts p, m1
  GROUP BY m1.m, m1.xbar, m1.ybar
)
SELECT CAST(m AS BIGINT) AS n_days,
       ROUND(sxy / sxx, 6) AS slope_c_per_day,
       ROUND(ybar - (sxy / sxx) * xbar, 6) AS intercept_c
FROM m2
"""


# ---------------------------------------------------------------------------
# Language x source chi-square independence
# ---------------------------------------------------------------------------


def q_lang_source_chi2(sf_dir: str):
    """Chi-square independence test of the (language, source)
    contingency table — do sources carry the same language mix.
    Margins are exact integers; each (o - e)^2/e term uses the
    transcribed e = row*col/total and folds over ascending
    (lang, source)."""
    docs = _documents(sf_dir, ["lang", "source"]).map_batches(
        lambda b: b.groupby(["lang", "source"], sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(docs, ["lang", "source"], [("n", "sum")])
        .to_pandas()
        .sort_values(["lang", "source"])
    )
    total = int(agg["n_sum"].sum())
    row = agg.groupby("lang")["n_sum"].transform("sum").astype(np.int64)
    col_map = agg.groupby("source")["n_sum"].sum().astype(np.int64)
    col = agg["source"].map(col_map).astype(np.int64)
    tf = float(total)
    terms = []
    for o, rx, cy in zip(agg["n_sum"], row, col):
        e = float(int(rx)) * float(int(cy)) / tf
        terms.append((float(int(o)) - e) * (float(int(o)) - e) / e)
    chi2 = _fold(terms)
    n_lang = int(agg["lang"].nunique())
    n_src = int(agg["source"].nunique())
    return pd.DataFrame(
        {
            "n_docs": np.array([total], dtype=np.int64),
            "n_langs": np.array([n_lang], dtype=np.int64),
            "n_sources": np.array([n_src], dtype=np.int64),
            "dof": np.array([(n_lang - 1) * (n_src - 1)], dtype=np.int64),
            "chi2": [float(_r6away(chi2))],
        }
    )


ORACLES35["lang_source_chi2"] = """
WITH c AS (
  SELECT lang, source, COUNT(*) AS n FROM documents GROUP BY 1, 2
),
w AS (
  SELECT lang, source, n,
         CAST(SUM(n) OVER (PARTITION BY lang) AS BIGINT) AS r,
         CAST(SUM(n) OVER (PARTITION BY source) AS BIGINT) AS cl,
         CAST(SUM(n) OVER () AS BIGINT) AS total
  FROM c
)
SELECT CAST(MAX(total) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
       CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
         AS BIGINT) AS dof,
       ROUND(list_sum(list(
         (CAST(n AS DOUBLE)
          - CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         * (CAST(n AS DOUBLE)
            - CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         / (CAST(r AS DOUBLE) * CAST(cl AS DOUBLE) / CAST(total AS DOUBLE))
         ORDER BY lang, source)), 6) AS chi2
FROM w
"""


# ---------------------------------------------------------------------------
# Day-profile self-similarity
# ---------------------------------------------------------------------------


def q_day_profile_similarity(sf_dir: str):
    """Mean Pearson correlation between every pair of daily 24-hour
    total-load profiles — near 1 means every day follows the same
    template (deseasonalization will work), near 0 means days are
    idiosyncratic. Each pair's correlation combines exact integer
    power sums over the 24 matched hours; zero-variance days are
    excluded from pairing identically on both sides; the outer mean
    folds over ascending (day_i, day_j)."""
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
    agg = (
        hash_bucket_aggregate(ev, ["day_us", "hod"], [("n", "sum")])
        .to_pandas()
    )
    days = sorted(agg["day_us"].unique())
    profiles = {}
    for d in days:
        g = agg[agg["day_us"] == d]
        v = np.zeros(24, dtype=np.int64)
        v[g["hod"].to_numpy(np.int64)] = g["n_sum"].to_numpy(np.int64)
        s = int(v.sum())
        ss = int((v * v).sum())
        if 24 * ss - s * s > 0:  # integer variance check
            profiles[d] = (v, s, ss)
    valid = sorted(profiles)
    corrs = []
    for i, a in enumerate(valid):
        va, sa, ssa = profiles[a]
        for b in valid[i + 1 :]:
            vb, sb, ssb = profiles[b]
            sxy = int((va * vb).sum())
            num = 24.0 * float(sxy) - float(sa) * float(sb)
            dx = 24.0 * float(ssa) - float(sa) * float(sa)
            dy = 24.0 * float(ssb) - float(sb) * float(sb)
            corrs.append(num / (math.sqrt(dx) * math.sqrt(dy)))
    mean_corr = _fold(corrs) / float(len(corrs))
    return pd.DataFrame(
        {
            "n_days": np.array([len(valid)], dtype=np.int64),
            "n_pairs": np.array([len(corrs)], dtype=np.int64),
            "mean_corr": [float(_r6away(mean_corr))],
        }
    )


ORACLES35["day_profile_similarity"] = """
WITH c AS (
  SELECT date_trunc('day', ts) AS day,
         (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
hods AS (SELECT UNNEST(generate_series(0, 23)) AS hod),
dense AS (
  SELECT d.day, hods.hod, CAST(COALESCE(c.n, 0) AS BIGINT) AS v
  FROM (SELECT DISTINCT day FROM c) d
  CROSS JOIN hods
  LEFT JOIN c ON c.day = d.day AND c.hod = hods.hod
),
st AS (
  SELECT day, CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS ss
  FROM dense GROUP BY 1
  HAVING 24 * SUM(v * v) - SUM(v) * SUM(v) > 0
),
p AS (
  SELECT a.day AS da, b.day AS db,
         CAST(SUM(x.v * y.v) AS BIGINT) AS sxy,
         MAX(a.s) AS sa, MAX(a.ss) AS ssa,
         MAX(b.s) AS sb, MAX(b.ss) AS ssb
  FROM st a JOIN st b ON a.day < b.day
  JOIN dense x ON x.day = a.day
  JOIN dense y ON y.day = b.day AND y.hod = x.hod
  GROUP BY 1, 2
),
r AS (
  SELECT da, db,
         (24.0 * CAST(sxy AS DOUBLE) - CAST(sa AS DOUBLE) * CAST(sb AS DOUBLE))
         / (sqrt(24.0 * CAST(ssa AS DOUBLE)
                 - CAST(sa AS DOUBLE) * CAST(sa AS DOUBLE))
            * sqrt(24.0 * CAST(ssb AS DOUBLE)
                   - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE))) AS corr
  FROM p
)
SELECT CAST((SELECT COUNT(*) FROM st) AS BIGINT) AS n_days,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(list_sum(list(corr ORDER BY da, db))
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_corr
FROM r
"""


QUERIES35["value_trend_daily"] = q_value_trend_daily
QUERIES35["lang_source_chi2"] = q_lang_source_chi2
QUERIES35["day_profile_similarity"] = q_day_profile_similarity
