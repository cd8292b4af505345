"""Round-3 batch 15: distribution-shape risk statistics — nearest-rank
5% value-at-risk with expected shortfall (pure integer order statistics),
Shannon entropy of the hourly load profile, character entropy per source,
and the Hill tail-index of per-user spend (the heavy-tail exponent
estimator).

House parity: VaR is the exact ceil(0.05·n)-th order statistic of int64
centivalues (no interpolation, no float quantile risk); ES is one
transcribed division over exact tail sums; both entropies and the Hill
sum are ascending/descending left-folds of libm logs
(list_sum(list(... ORDER BY ...)) == a sequential Python math.log loop,
the token_entropy contract).

Scale contracts: per-type value series flow through bucketed_map_groups
(the quantiles contract); char/hour tables are alphabet/retention-
bounded; the Hill top-k reduces via per-batch partial top-(k+1) so only
k+1 rows ever reach the driver.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_map_groups, hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries4 import _cents
from .queries6 import _hourly_counts

HILL_K = 10

QUERIES13: dict = {}
ORACLES13: dict = {}


# ---------------------------------------------------------------------------
# Nearest-rank 5% VaR + expected shortfall
# ---------------------------------------------------------------------------


def q_tail_risk_by_type(sf_dir: str):
    """Per event type: the 5% value-at-risk as the exact ceil(0.05·n)-th
    smallest centivalue (nearest-rank — an order statistic, so no
    interpolation parity surface at all) and the expected shortfall
    (mean of the tail at or below it). Tail sums exact int64; one
    transcribed division."""

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        c = np.sort(_cents(df["value"]))
        n = c.size
        k_idx = (5 * n + 99) // 100  # ceil(0.05 n), 1-based
        var_c = int(c[k_idx - 1])
        tail = c[c <= var_c]
        s = int(tail.sum())
        k = int(tail.size)
        return pd.DataFrame(
            {
                "event_type": [df["event_type"].iloc[0]],
                "var_value": _r6away(float(var_c) / 100.0),
                "n_tail": np.array([k], dtype=np.int64),
                "es_value": _r6away(float(s) / float(k) / 100.0),
            }
        )

    return bucketed_map_groups(
        _events(sf_dir, ["event_type", "value"]), ["event_type"], fn
    )


ORACLES13["tail_risk_by_type"] = """
WITH c AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
r AS (
  SELECT event_type, c,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY c) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS cnt
  FROM c
),
v AS (
  SELECT event_type, c AS var_c FROM r
  WHERE rn = (5 * cnt + 99) // 100
),
t AS (
  SELECT c.event_type, v.var_c,
         CAST(SUM(c.c) AS BIGINT) AS s, COUNT(*) AS k
  FROM c JOIN v USING (event_type)
  WHERE c.c <= v.var_c
  GROUP BY 1, 2
)
SELECT event_type,
       ROUND(CAST(var_c AS DOUBLE) / 100.0, 6) AS var_value,
       k AS n_tail,
       ROUND(CAST(s AS DOUBLE) / CAST(k AS DOUBLE) / 100.0, 6) AS es_value
FROM t
"""


# ---------------------------------------------------------------------------
# Shannon entropy of the hourly load profile
# ---------------------------------------------------------------------------


def q_load_entropy(sf_dir: str):
    """Per event type: Shannon entropy (nats) of its load distribution
    across present hours — H = ln(S) - (Σ n·ln n)/S with the only
    multi-term float reduction run as an ascending-hour left-fold on
    both engines. High H = evenly spread load; low H = concentrated
    (the information-theoretic twin of load_concentration_hhi)."""
    agg = _hourly_counts(sf_dir)
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        g = g.sort_values("hour_us")
        s = int(g["n_sum"].sum())
        f = 0.0
        for n in g["n_sum"]:  # ascending-hour left-fold
            f = f + float(n) * math.log(float(n))
        h = math.log(float(s)) - f / float(s)
        rows.append((t, s, float(_r6away(h))))
    return pd.DataFrame(rows, columns=["event_type", "n_events", "entropy"]).astype(
        {"n_events": np.int64}
    )


ORACLES13["load_entropy"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
a AS (
  SELECT event_type,
         CAST(SUM(n) AS BIGINT) AS s,
         list_sum(list(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)) ORDER BY bh)) AS f
  FROM h GROUP BY 1
)
SELECT event_type, s AS n_events,
       ROUND(ln(CAST(s AS DOUBLE)) - f / CAST(s AS DOUBLE), 6) AS entropy
FROM a
"""


# ---------------------------------------------------------------------------
# Character entropy per source
# ---------------------------------------------------------------------------


def q_char_entropy_by_source(sf_dir: str):
    """Per source: Shannon entropy (nats) of the raw character
    distribution (spaces included) — the cheapest compressibility /
    gibberish proxy in the quality-scoring family. Char counts reduce
    through an alphabet-bounded exchange; the entropy fold runs over
    ascending codepoints on both engines."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: Counter = Counter()
        for src, text in zip(batch["source"], batch["text"]):
            for ch, k in Counter(text or "").items():
                rows[(src, ch)] += k
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [x[0] for x in keys],
                "ch": [x[1] for x in keys],
                "m": np.array([rows[x] for x in keys], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "ch"],
        [("m", "sum")],
    ).to_pandas()  # sources x alphabet bounded
    rows = []
    for src, g in agg.groupby("source", sort=True):
        g = g.sort_values("ch")
        s = int(g["m_sum"].sum())
        f = 0.0
        for m in g["m_sum"]:  # ascending-codepoint left-fold
            f = f + float(m) * math.log(float(m))
        h = math.log(float(s)) - f / float(s)
        rows.append((src, s, int(g.shape[0]), float(_r6away(h))))
    return pd.DataFrame(
        rows, columns=["source", "n_chars", "alphabet", "entropy"]
    ).astype({"n_chars": np.int64, "alphabet": np.int64})


ORACLES13["char_entropy_by_source"] = """
WITH ch AS (
  SELECT source,
         UNNEST(list_transform(range(0, length(text)),
                               i -> substr(text, CAST(i AS INT) + 1, 1))) AS ch
  FROM documents
),
c AS (SELECT source, ch, COUNT(*) AS m FROM ch GROUP BY 1, 2),
a AS (
  SELECT source,
         CAST(SUM(m) AS BIGINT) AS s,
         COUNT(*) AS alphabet,
         list_sum(list(CAST(m AS DOUBLE) * ln(CAST(m AS DOUBLE)) ORDER BY ch)) AS f
  FROM c GROUP BY 1
)
SELECT source, s AS n_chars, alphabet,
       ROUND(ln(CAST(s AS DOUBLE)) - f / CAST(s AS DOUBLE), 6) AS entropy
FROM a
"""


# ---------------------------------------------------------------------------
# Hill tail-index of per-user spend
# ---------------------------------------------------------------------------


def q_hill_tail_index(sf_dir: str, k: int = HILL_K):
    """Hill estimator of the heavy-tail exponent of per-user total spend:
    alpha = 1 / ((1/k) Σ_{i=1..k} ln(x_(i) / x_(k+1))) over the top-k
    user totals against the (k+1)-th as threshold — the standard
    power-law tail gauge (pareto_share reports shares; this estimates
    the exponent).

    Plan: per-user totals reduce through one exchange; each batch then
    contributes only its top-(k+1) rows, so the driver merge sees
    k+1 rows per batch, never the user table. Deterministic ties
    (total DESC, user ASC); the log fold runs in that same order on
    both engines."""
    ev = _events(sf_dir, ["user_id", "value"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "c": _cents(b["value"]),
            }
        )
        .groupby("user_id", sort=False)["c"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_user = hash_bucket_aggregate(ev, ["user_id"], [("c", "sum")])
    topk = (
        per_user.map_batches(
            lambda b: b.sort_values(
                ["c_sum", "user_id"], ascending=[False, True]
            ).head(k + 1),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values(["c_sum", "user_id"], ascending=[False, True])
        .head(k + 1)
    )
    thr = int(topk["c_sum"].iloc[k])
    f = 0.0
    for c in topk["c_sum"].iloc[:k]:  # descending-total left-fold
        f = f + (math.log(float(int(c))) - math.log(float(thr)))
    hill_inv = f / float(k)
    alpha = 1.0 / hill_inv
    return pd.DataFrame(
        {
            "k": np.array([k], dtype=np.int64),
            "threshold_c": np.array([thr], dtype=np.int64),
            "alpha": _r6away(alpha),
        }
    )


ORACLES13["hill_tail_index"] = f"""
WITH u AS (
  SELECT user_id, CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS c
  FROM events GROUP BY 1
),
r AS (
  SELECT user_id, c,
         ROW_NUMBER() OVER (ORDER BY c DESC, user_id) AS rn
  FROM u
),
thr AS (SELECT c AS thr FROM r WHERE rn = {HILL_K} + 1),
f AS (
  SELECT list_sum(list(ln(CAST(r.c AS DOUBLE)) - ln(CAST(t.thr AS DOUBLE))
                       ORDER BY r.c DESC, r.user_id)) AS f,
         MAX(t.thr) AS thr
  FROM r CROSS JOIN thr t
  WHERE r.rn <= {HILL_K}
)
SELECT CAST({HILL_K} AS BIGINT) AS k,
       CAST(thr AS BIGINT) AS threshold_c,
       ROUND(1.0 / (f / CAST({HILL_K} AS DOUBLE)), 6) AS alpha
FROM f
"""


QUERIES13["tail_risk_by_type"] = q_tail_risk_by_type
QUERIES13["load_entropy"] = q_load_entropy
QUERIES13["char_entropy_by_source"] = q_char_entropy_by_source
QUERIES13["hill_tail_index"] = q_hill_tail_index
