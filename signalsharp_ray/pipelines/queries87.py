"""Round-3 batch 89: profile-similarity and churn operators — the
cosine similarity between event types' hour-of-day load profiles (do
two behaviours share a diurnal shape; exact integer dot products), the
month-over-month user churn table (active, retained, churn rate), and
the entropy of document opening tokens per source (how templated are
the openings — the entropy view over first_token_topk's counts).

House parity: profile cosines are integer dots over 24-cell count
vectors with one transcribed float; churn is exact (user, month) set
arithmetic through one exchange; first-token entropy folds ln over
integer shares ascending the token.

Scale contracts: profiles reduce to types x 24 integers; churn
pre-reduces per (user, month) then per month pair; token entropy is a
bounded vocabulary aggregate.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries14 import _fold
from .queries16 import _TOKEN_RE

QUERIES87: dict = {}
ORACLES87: dict = {}

HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# Type hod-profile cosine matrix
# ---------------------------------------------------------------------------


def q_type_profile_cosine(sf_dir: str):
    """Per event_type pair (a < b): cosine similarity of the 24-cell
    hour-of-day count profiles — exact integer dot and norms, one
    float expression."""
    ev = _events(sf_dir, ["event_type", "ts"]).map_batches(
        lambda b: (
            lambda us: pd.DataFrame(
                {
                    "event_type": b["event_type"],
                    "hod": ((us // HOUR_US) % 24).astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                }
            )
        )(b["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        .groupby(["event_type", "hod"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        ev, ["event_type", "hod"], [("n", "sum")]
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"type_a": pd.Series(dtype=object),
         "type_b": pd.Series(dtype=object),
         "cosine": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    types = sorted(agg["event_type"].unique().tolist())
    prof = {}
    for et in types:
        v = np.zeros(24, dtype=np.int64)
        g = agg[agg["event_type"] == et]
        v[g["hod"].to_numpy(np.int64)] = g["n_sum"].to_numpy(np.int64)
        prof[et] = v
    rows = []
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            dot = int((prof[a] * prof[b]).sum())
            na = int((prof[a] * prof[a]).sum())
            nb = int((prof[b] * prof[b]).sum())
            if na == 0 or nb == 0:
                continue
            c = float(dot) / (math.sqrt(float(na)) * math.sqrt(float(nb)))
            rows.append((a, b, float(_r6away(c))))
    if not rows:
        return out_empty
    return pd.DataFrame(rows, columns=["type_a", "type_b", "cosine"])


ORACLES87["type_profile_cosine"] = """
WITH c AS (
  SELECT event_type, (epoch_us(ts) // 3600000000) % 24 AS hod,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
nrm AS (
  SELECT event_type, CAST(SUM(n * n) AS BIGINT) AS nn FROM c GROUP BY 1
),
dots AS (
  SELECT a.event_type AS ta, b.event_type AS tb,
         CAST(SUM(a.n * b.n) AS BIGINT) AS dot
  FROM c a JOIN c b ON b.hod = a.hod AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT d.ta AS type_a, d.tb AS type_b,
       ROUND(CAST(d.dot AS DOUBLE)
             / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))),
             6) AS cosine
FROM dots d
JOIN nrm na ON na.event_type = d.ta
JOIN nrm nb ON nb.event_type = d.tb
WHERE na.nn > 0 AND nb.nn > 0
"""


# ---------------------------------------------------------------------------
# Month-over-month user churn
# ---------------------------------------------------------------------------


def q_monthly_churn(sf_dir: str):
    """Per consecutive month pair: users active in the earlier month,
    users retained into the next, and the churn rate. Months are
    calendar (year*12 + month) integers; set sizes are exact."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "user_id": b["user_id"].astype(np.int64),
                "m": (
                    b["ts"].dt.year.astype(np.int64) * 12
                    + b["ts"].dt.month.astype(np.int64)
                ),
                "one": np.ones(len(b), dtype=np.int64),
            }
        ).drop_duplicates(subset=["user_id", "m"]),
        batch_format="pandas",
    )
    um = hash_bucket_aggregate(
        ev, ["user_id", "m"], [("one", "max")]
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"month_key": pd.Series(dtype=np.int64),
         "n_active": pd.Series(dtype=np.int64),
         "n_retained": pd.Series(dtype=np.int64),
         "churn_rate": pd.Series(dtype=np.float64)}
    )
    if um.empty:
        return out_empty
    months = sorted(um["m"].unique().tolist())
    sets = {m: set(um.loc[um["m"] == m, "user_id"]) for m in months}
    rows = []
    for m in months:
        if m + 1 not in sets:
            continue
        act = len(sets[m])
        ret = len(sets[m] & sets[m + 1])
        rows.append(
            (int(m), act, ret,
             float(_r6away(float(act - ret) / float(act))))
        )
    if not rows:
        return out_empty
    return pd.DataFrame(
        rows, columns=["month_key", "n_active", "n_retained", "churn_rate"]
    ).astype({"month_key": np.int64, "n_active": np.int64,
              "n_retained": np.int64})


ORACLES87["monthly_churn"] = """
WITH um AS (
  SELECT DISTINCT user_id,
         CAST(year(ts) * 12 + month(ts) AS BIGINT) AS m
  FROM events
),
act AS (SELECT m, COUNT(*) AS n_active FROM um GROUP BY 1),
ret AS (
  SELECT a.m, COUNT(*) AS n_retained
  FROM um a JOIN um b ON b.user_id = a.user_id AND b.m = a.m + 1
  GROUP BY 1
)
SELECT act.m AS month_key,
       CAST(act.n_active AS BIGINT) AS n_active,
       CAST(COALESCE(ret.n_retained, 0) AS BIGINT) AS n_retained,
       ROUND(CAST(act.n_active - COALESCE(ret.n_retained, 0) AS DOUBLE)
             / CAST(act.n_active AS DOUBLE), 6) AS churn_rate
FROM act LEFT JOIN ret USING (m)
WHERE EXISTS (SELECT 1 FROM act a2 WHERE a2.m = act.m + 1)
"""


# ---------------------------------------------------------------------------
# First-token entropy per source
# ---------------------------------------------------------------------------


def q_first_token_entropy(sf_dir: str):
    """Per source: distinct opening tokens, total docs with one, and
    the Shannon entropy (nats) of the opening-token distribution —
    templated openings score low."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        src, tok = [], []
        for s, text in zip(batch["source"], batch["text"]):
            m = _TOKEN_RE.search((text or "").lower())
            if m:
                src.append(s)
                tok.append(m.group(0))
        out = pd.DataFrame({"source": src, "tok": tok})
        out["n"] = np.ones(len(out), dtype=np.int64)
        return out.groupby(["source", "tok"], sort=False).sum().reset_index()

    agg = (
        hash_bucket_aggregate(
            docs.map_batches(partial, batch_format="pandas"),
            ["source", "tok"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["source", "tok"])
    )
    rows = []
    for src, g in agg.groupby("source", sort=True):
        tot = int(g["n_sum"].sum())
        terms = []
        for _, r in g.iterrows():
            p = float(int(r["n_sum"])) / float(tot)
            terms.append(p * math.log(p))
        rows.append((src, len(g), tot, float(_r6away(-_fold(terms)))))
    return pd.DataFrame(
        rows, columns=["source", "n_tokens", "n_docs", "entropy"]
    ).astype({"n_tokens": np.int64, "n_docs": np.int64})


ORACLES87["first_token_entropy"] = """
WITH f AS (
  SELECT source,
         regexp_extract(lower(COALESCE(text, '')),
                        '[\\p{L}\\p{N}_]+', 0) AS tok
  FROM documents
  WHERE regexp_extract(lower(COALESCE(text, '')), '[\\p{L}\\p{N}_]+', 0)
        != ''
),
c AS (SELECT source, tok, COUNT(*) AS n FROM f GROUP BY 1, 2),
t AS (SELECT source, SUM(n) AS tot, COUNT(*) AS k FROM c GROUP BY 1)
SELECT c.source,
       CAST(MAX(t.k) AS BIGINT) AS n_tokens,
       CAST(MAX(t.tot) AS BIGINT) AS n_docs,
       ROUND(-list_sum(list(
         (CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         ORDER BY c.tok)), 6) AS entropy
FROM c JOIN t USING (source)
GROUP BY c.source
"""


QUERIES87["type_profile_cosine"] = q_type_profile_cosine
QUERIES87["monthly_churn"] = q_monthly_churn
QUERIES87["first_token_entropy"] = q_first_token_entropy
