"""Round-3 batch 25: cluster-quality and calendar diagnostics — the
Calinski-Harabasz variance-ratio score of the embedding labels
(between/within scatter from EXACT quantized integer sums — no vector
ever reaches the driver), a lognormal fit of per-type inter-arrival
gaps (the long-tail latency model), the day-of-week chi-square
uniformity test (the weekly twin of chi2_hour_of_day, with dow computed
as the SAME integer epoch-day formula on both engines), and the
part-size price curve (does bigger cost more).

House parity: scatter decompositions use W = Q2 - sum_l |s_l|^2/n_l and
B = sum_l n_l ||c_l - c||^2 where Q2, s_l, n_l are exact integers and
every float reduction is an ascending-(label, dim) left-fold; gap log
moments fold in (ts, event_id) occurrence order with gap > 0 filtered
identically; dow = (epoch_us // day_us + 4) % 7 (0 = Sunday) avoids any
engine dayofweek() convention mismatch; prices are exact cents.

Scale contracts: the embedding exchange moves labels x dims integers;
gap kernels run per type through bucketed_map_groups; histograms are
7- / size-bounded.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _events, _r6away
from .queries4 import _quantize_rows
from .queries14 import _fold
from .queries16 import _cents_col, _read

QUERIES23: dict = {}
ORACLES23: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Calinski-Harabasz score of embedding labels
# ---------------------------------------------------------------------------


def q_calinski_harabasz(sf_dir: str):
    """Calinski-Harabasz variance-ratio of the labelled embeddings
    (quantized units): CH = (B/(k-1)) / (W/(n-k)) with the
    between-scatter B = sum_l n_l ||c_l - c||^2 and within-scatter
    W = Q2 - sum_l |s_l|^2 / n_l derived entirely from exact integer
    component sums — higher = tighter, better-separated clusters."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = _quantize_rows(batch["embedding"])
        labels = batch["label"].to_numpy(np.int64)
        rows = []
        for lab in np.unique(labels):
            sel = q[labels == lab]
            d = q.shape[1]
            rows.append(
                pd.DataFrame(
                    {
                        "label": np.full(d, lab, dtype=np.int64),
                        "dim": np.arange(d, dtype=np.int64),
                        "n": np.full(d, sel.shape[0], dtype=np.int64),
                        "sum_q": sel.sum(axis=0),
                        "q2": np.full(d, int((sel * sel).sum()), dtype=np.int64),
                    }
                )
            )
        return pd.concat(rows, ignore_index=True)

    agg = (
        hash_bucket_aggregate(
            ds.map_batches(partial, batch_format="pandas"),
            ["label", "dim"],
            [("n", "sum"), ("sum_q", "sum"), ("q2", "sum")],
        )
        .to_pandas()
        .sort_values(["label", "dim"])
    )
    labels = sorted(agg["label"].unique())
    k = len(labels)
    dims = sorted(agg["dim"].unique())
    n = 0
    q2 = 0
    s_global = {d: 0 for d in dims}
    per_label: dict = {}
    for lab, g in agg.groupby("label"):
        g = g.sort_values("dim")
        nl = int(g["n_sum"].iloc[0])
        n += nl
        # q2 column repeats the per-batch scalar across dims; dim 0 row
        # carries the label total after the exchange sum
        q2 += int(g["q2_sum"].iloc[0]) // len(dims) * 0  # placeholder, fixed below
        sl = [int(x) for x in g["sum_q_sum"]]
        per_label[lab] = (nl, sl)
        for d, x in zip(dims, sl):
            s_global[d] += x
    # q2 was replicated across the d rows of each partial; every dim row
    # aggregated the same per-batch scalar, so any single dim's sum is the
    # true total
    q2 = int(agg[agg["dim"] == 0]["q2_sum"].sum())
    nf = float(n)
    c_global = [float(s_global[d]) / nf for d in dims]
    w_terms = []
    b_terms = []
    for lab in labels:
        nl, sl = per_label[lab]
        nlf = float(nl)
        s2 = 0
        for x in sl:
            s2 += x * x  # exact python int
        w_terms.append(float(s2) / nlf)
        inner = _fold(
            [
                (float(x) / nlf - c) * (float(x) / nlf - c)
                for x, c in zip(sl, c_global)
            ]
        )
        b_terms.append(nlf * inner)
    w = float(q2) - _fold(w_terms)
    b = _fold(b_terms)
    ch = (b / float(k - 1)) / (w / float(n - k))
    return pd.DataFrame(
        {
            "n_vecs": np.array([n], dtype=np.int64),
            "n_labels": np.array([k], dtype=np.int64),
            "between_ss": [float(_r6away(b))],
            "within_ss": [float(_r6away(w))],
            "ch_score": [float(_r6away(ch))],
        }
    )


ORACLES23["calinski_harabasz"] = """
WITH m AS (
  SELECT label, embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS ma
  FROM embeddings
),
e AS (
  SELECT label,
         unnest(range(0, len(embedding))) AS dim,
         unnest(list_transform(embedding,
           x -> CASE WHEN ma = 0 THEN 0
                     ELSE CAST(ROUND(CAST(x AS DOUBLE) / CAST(ma AS DOUBLE) * 127)
                               AS BIGINT) END)) AS q
  FROM m
),
c AS (
  SELECT CAST(label AS BIGINT) AS label, dim,
         COUNT(*) AS n, CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(q * q) AS BIGINT) AS q2
  FROM e GROUP BY 1, 2
),
gstats AS (
  SELECT CAST(SUM(CASE WHEN dim = 0 THEN n ELSE 0 END) AS BIGINT) AS n,
         COUNT(DISTINCT label) AS k,
         CAST(SUM(q2) AS BIGINT) AS q2
  FROM c
),
gdim AS (
  SELECT dim, CAST(SUM(sq) AS BIGINT) AS s FROM c GROUP BY 1
),
lab0 AS (SELECT label, MAX(n) AS nl FROM c GROUP BY 1),
lab AS (
  SELECT c.label, l0.nl,
         CAST(list_sum(list(c.sq::HUGEINT * c.sq::HUGEINT ORDER BY c.dim))
           AS BIGINT) AS s2,
         list_sum(list(
           (CAST(c.sq AS DOUBLE) / CAST(l0.nl AS DOUBLE)
            - CAST(g.s AS DOUBLE) / CAST(gl.n AS DOUBLE))
           * (CAST(c.sq AS DOUBLE) / CAST(l0.nl AS DOUBLE)
              - CAST(g.s AS DOUBLE) / CAST(gl.n AS DOUBLE))
           ORDER BY c.dim)) AS inner_ss
  FROM c JOIN lab0 l0 USING (label)
  JOIN gdim g USING (dim) CROSS JOIN gstats gl
  GROUP BY c.label, l0.nl
),
agg AS (
  SELECT gl.n, gl.k, gl.q2,
         list_sum(list(CAST(l.s2 AS DOUBLE) / CAST(l.nl AS DOUBLE)
                       ORDER BY l.label)) AS w_sub,
         list_sum(list(CAST(l.nl AS DOUBLE) * l.inner_ss ORDER BY l.label)) AS b
  FROM lab l CROSS JOIN gstats gl
  GROUP BY gl.n, gl.k, gl.q2
)
SELECT CAST(n AS BIGINT) AS n_vecs,
       CAST(k AS BIGINT) AS n_labels,
       ROUND(b, 6) AS between_ss,
       ROUND(CAST(q2 AS DOUBLE) - w_sub, 6) AS within_ss,
       ROUND((b / CAST(k - 1 AS DOUBLE))
             / ((CAST(q2 AS DOUBLE) - w_sub) / CAST(n - k AS DOUBLE)), 6)
         AS ch_score
FROM agg
"""


# ---------------------------------------------------------------------------
# Lognormal fit of inter-arrival gaps per type
# ---------------------------------------------------------------------------


def q_gap_lognormal(sf_dir: str):
    """Per event type: maximum-likelihood lognormal fit of positive
    inter-arrival gaps (microseconds): mu/sigma of ln(gap) and the
    exp(mu) median estimate — the heavy-tail latency model that
    complements exp_gof's Poisson test. Log moments fold in
    (ts, event_id) occurrence order on both engines; zero gaps are
    excluded identically (ln domain)."""
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
        gaps = gaps[gaps > 0]
        n = int(gaps.size)
        if n == 0:
            return pd.DataFrame(
                {
                    "event_type": pd.Series(dtype=object),
                    "n_gaps": pd.Series(dtype=np.int64),
                    "ln_mu": pd.Series(dtype=np.float64),
                    "ln_sigma": pd.Series(dtype=np.float64),
                    "median_est_us": pd.Series(dtype=np.float64),
                }
            )
        logs = [math.log(float(int(g))) for g in gaps]
        f1 = _fold(logs)
        f2 = _fold([x * x for x in logs])
        mu = f1 / float(n)
        var = f2 / float(n) - mu * mu
        # clamp: constant gaps can round var to a tiny negative; the SQL
        # side applies the identical GREATEST(var, 0) to the same double
        sigma = math.sqrt(var if var > 0.0 else 0.0)
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "n_gaps": np.array([n], dtype=np.int64),
                "ln_mu": [float(_r6away(mu))],
                "ln_sigma": [float(_r6away(sigma))],
                # whole-unit round: at ~1e9 us a 1-ulp exp() divergence IS
                # the 6th decimal (house rule: floor(x+0.5) == ROUND(x, 0))
                "median_est_us": [float(math.floor(math.exp(mu) + 0.5))],
            }
        )

    return bucketed_map_groups(
        ev.map_batches(prep, batch_format="pandas"), ["event_type"], kernel
    )


ORACLES23["gap_lognormal"] = """
WITH s AS (
  SELECT event_type, ts, event_id,
         epoch_us(ts) - LAG(epoch_us(ts))
           OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
  FROM events
),
g AS (
  SELECT event_type, ts, event_id, ln(CAST(gap AS DOUBLE)) AS x
  FROM s WHERE gap IS NOT NULL AND gap > 0
),
a AS (
  SELECT event_type, COUNT(*) AS n,
         list_sum(list(x ORDER BY ts, event_id)) AS f1,
         list_sum(list(x * x ORDER BY ts, event_id)) AS f2
  FROM g GROUP BY 1
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_gaps,
       ROUND(f1 / CAST(n AS DOUBLE), 6) AS ln_mu,
       ROUND(sqrt(GREATEST(f2 / CAST(n AS DOUBLE)
                  - (f1 / CAST(n AS DOUBLE)) * (f1 / CAST(n AS DOUBLE)),
                  CAST(0.0 AS DOUBLE))), 6)
         AS ln_sigma,
       ROUND(exp(f1 / CAST(n AS DOUBLE)), 0) AS median_est_us
FROM a
"""


# ---------------------------------------------------------------------------
# Day-of-week chi-square uniformity
# ---------------------------------------------------------------------------


def q_chi2_day_of_week(sf_dir: str):
    """Per event type: chi-square of the day-of-week histogram against
    uniform e = n/7 — the weekly-rhythm screen beside
    chi2_hour_of_day. dow = (epoch_day + 4) % 7 (0 = Sunday) is the
    SAME integer formula on both engines; the 7 (o-e)^2/e terms fold in
    ascending dow order."""
    ev = _events(sf_dir, ["ts", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        dow = (
            batch["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US + 4
        ) % 7
        g = (
            pd.DataFrame({"event_type": batch["event_type"], "dow": dow})
            .groupby(["event_type", "dow"], sort=False)
            .size()
            .reset_index(name="n")
        )
        g["n"] = g["n"].astype(np.int64)
        return g

    agg = hash_bucket_aggregate(
        ev.map_batches(partial, batch_format="pandas"),
        ["event_type", "dow"],
        [("n", "sum")],
    ).to_pandas()
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        o = np.zeros(7, dtype=np.int64)
        o[g["dow"].to_numpy(np.int64)] = g["n_sum"].to_numpy(np.int64)
        n = int(o.sum())
        e = float(n) / 7.0
        terms = [
            (float(int(x)) - e) * (float(int(x)) - e) / e for x in o
        ]  # ascending dow
        rows.append((t, n, float(_r6away(_fold(terms)))))
    return pd.DataFrame(rows, columns=["event_type", "n_events", "chi2"]).astype(
        {"n_events": np.int64}
    )


ORACLES23["chi2_day_of_week"] = """
WITH d AS (
  SELECT event_type,
         (epoch_us(ts) // 86400000000 + 4) % 7 AS dow
  FROM events
),
c AS (SELECT event_type, dow, COUNT(*) AS n FROM d GROUP BY 1, 2),
dows AS (SELECT UNNEST(generate_series(0, 6)) AS dow),
dense AS (
  SELECT t.event_type, dows.dow, CAST(COALESCE(c.n, 0) AS BIGINT) AS o
  FROM (SELECT DISTINCT event_type FROM c) t
  CROSS JOIN dows
  LEFT JOIN c ON c.event_type = t.event_type AND c.dow = dows.dow
),
tot AS (
  SELECT event_type, CAST(SUM(o) AS BIGINT) AS n FROM dense GROUP BY 1
)
SELECT d.event_type,
       t.n AS n_events,
       ROUND(list_sum(list(
         (CAST(d.o AS DOUBLE) - CAST(t.n AS DOUBLE) / 7.0)
         * (CAST(d.o AS DOUBLE) - CAST(t.n AS DOUBLE) / 7.0)
         / (CAST(t.n AS DOUBLE) / 7.0)
         ORDER BY d.dow)), 6) AS chi2
FROM dense d JOIN tot t USING (event_type)
GROUP BY d.event_type, t.n
"""


# ---------------------------------------------------------------------------
# Part-size price curve
# ---------------------------------------------------------------------------


def q_part_size_price(sf_dir: str):
    """Per part size: part count and exact retail-price statistics
    (mean over exact cents, min, max) — the size-price monotonicity
    check. One bounded exchange; one transcribed division."""
    parts = _read(sf_dir, "part", ["p_size", "p_retailprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "size": b["p_size"].astype(np.int64),
                "pc": _cents_col(b["p_retailprice"]),
            }
        )
        .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby("size", sort=False)
        .agg(n=("n", "sum"), s=("pc", "sum"), mn=("pc", "min"), mx=("pc", "max"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        parts, ["size"], [("n", "sum"), ("s", "sum"), ("mn", "min"), ("mx", "max")]
    ).to_pandas()
    mean = [
        float(_r6away(float(int(s)) / float(int(n)) / 100.0))
        for s, n in zip(agg["s_sum"], agg["n_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "size": agg["size"].astype(np.int64),
                "n_parts": agg["n_sum"].astype(np.int64),
                "mean_price": mean,
                "min_price_c": agg["mn_min"].astype(np.int64),
                "max_price_c": agg["mx_max"].astype(np.int64),
            }
        )
        .sort_values("size")
        .reset_index(drop=True)
    )


ORACLES23["part_size_price"] = """
SELECT CAST(p_size AS BIGINT) AS size,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) / 100.0, 6) AS mean_price,
       MIN(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS min_price_c,
       MAX(CAST(ROUND(p_retailprice * 100) AS BIGINT)) AS max_price_c
FROM part GROUP BY 1
"""


QUERIES23["calinski_harabasz"] = q_calinski_harabasz
QUERIES23["gap_lognormal"] = q_gap_lognormal
QUERIES23["chi2_day_of_week"] = q_chi2_day_of_week
QUERIES23["part_size_price"] = q_part_size_price
