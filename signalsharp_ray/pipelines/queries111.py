"""Round-3 batch 113: dispersion and coverage operators — the
coefficient of variation of sentence lengths per source (uniform
template prose vs varied writing), the mean day-of-week entropy across
users (how spread individual weekly rhythms are), and the share of the
part catalog shipped each month (assortment coverage over time).

House parity: sentence-length moments are exact integer sums (batch-70
splitter); per-user dow entropies fold dow-ascending and the
population mean folds user-ascending; monthly coverage is exact
distinct counting against the catalog size.

Scale contracts: sentence moments reduce per source through one
exchange; user entropies reduce per user; coverage dedups (month,
part) pairs in one exchange.
"""

from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries14 import _fold
from .queries16 import _read, _TOKEN_RE

QUERIES111: dict = {}
ORACLES111: dict = {}

_SENT_RE = re.compile(r"[.!?]+")
DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Sentence-length CV per source
# ---------------------------------------------------------------------------


def q_sentence_len_cv(sf_dir: str):
    """Per source: sentence count, mean words per sentence, and the
    population CV of sentence lengths — templated prose scores low."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for s, text in zip(batch["source"], batch["text"]):
            n = w = ww = 0
            for seg in _SENT_RE.split((text or "").lower()):
                nw = len(_TOKEN_RE.findall(seg))
                if nw > 0:
                    n += 1
                    w += nw
                    ww += nw * nw
            if n:
                rows.append((s, n, w, ww))
        return pd.DataFrame(
            rows, columns=["source", "n", "w", "ww"]
        ).astype({"n": np.int64, "w": np.int64, "ww": np.int64})

    agg = (
        hash_bucket_aggregate(
            docs.map_batches(partial, batch_format="pandas"),
            ["source"],
            [("n", "sum"), ("w", "sum"), ("ww", "sum")],
        )
        .to_pandas()
        .sort_values("source")
    )
    rows = []
    for _, r in agg.iterrows():
        n = int(r["n_sum"])
        w = int(r["w_sum"])
        ww = int(r["ww_sum"])
        if n == 0 or w == 0:
            continue
        m = float(w) / n
        var = float(ww) / n - m * m
        if var < 0.0:
            var = 0.0
        rows.append(
            (r["source"], n, float(_r6away(m)),
             float(_r6away(math.sqrt(var) / m)))
        )
    return pd.DataFrame(
        rows, columns=["source", "n_sentences", "mean_words", "cv"]
    ).astype({"n_sentences": np.int64})


ORACLES111["sentence_len_cv"] = """
WITH segs AS (
  SELECT source,
         UNNEST(regexp_split_to_array(lower(COALESCE(text, '')), '[.!?]+'))
           AS seg
  FROM documents
),
w AS (
  SELECT source, len(regexp_extract_all(seg, '[\\p{L}\\p{N}_]+')) AS nw
  FROM segs
),
a AS (
  SELECT source, COUNT(*) AS n, SUM(nw) AS sw, SUM(nw * nw) AS sww
  FROM w WHERE nw > 0 GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_sentences,
       ROUND(CAST(sw AS DOUBLE) / n, 6) AS mean_words,
       ROUND(sqrt(GREATEST(CAST(sww AS DOUBLE) / n
                           - (CAST(sw AS DOUBLE) / n)
                             * (CAST(sw AS DOUBLE) / n), 0.0))
             / (CAST(sw AS DOUBLE) / n), 6) AS cv
FROM a WHERE n > 0 AND sw > 0
"""


# ---------------------------------------------------------------------------
# Mean user day-of-week entropy
# ---------------------------------------------------------------------------


def q_user_dow_entropy_mean(sf_dir: str):
    """One global row: over users with >= 5 events, the mean Shannon
    entropy (nats) of their day-of-week activity distribution —
    individual weekly-rhythm spread."""
    ev = _events(sf_dir, ["user_id", "ts"]).map_batches(
        lambda b: (
            lambda us: pd.DataFrame(
                {
                    "user_id": b["user_id"].astype(np.int64),
                    "dow": (((us // DAY_US) + 3) % 7).astype(np.int64),
                    "n": np.ones(len(us), dtype=np.int64),
                }
            )
        )(b["ts"].astype("datetime64[us]").astype("int64").to_numpy())
        .groupby(["user_id", "dow"], sort=False)
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    agg = hash_bucket_aggregate(
        ev, ["user_id", "dow"], [("n", "sum")]
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"n_users": pd.Series(dtype=np.int64),
         "mean_entropy": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    tot = agg.groupby("user_id")["n_sum"].sum().astype(np.int64)
    keep = set(tot[tot >= 5].index)
    ents = []
    for uid in sorted(keep):
        g = agg[agg["user_id"] == uid].sort_values("dow")
        t = int(tot.loc[uid])
        terms = []
        for _, r in g.iterrows():
            p = float(int(r["n_sum"])) / float(t)
            terms.append(p * math.log(p))
        ents.append(-_fold(terms))
    k = len(ents)
    if k == 0:
        return out_empty
    return pd.DataFrame(
        {
            "n_users": np.array([k], dtype=np.int64),
            "mean_entropy": [float(_r6away(_fold(ents) / float(k)))],
        }
    )


ORACLES111["user_dow_entropy_mean"] = """
WITH c AS (
  SELECT user_id, (epoch_us(ts) // 86400000000 + 3) % 7 AS dow,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT user_id, SUM(n) AS tot FROM c GROUP BY 1 HAVING SUM(n) >= 5
),
e AS (
  SELECT c.user_id,
         -list_sum(list(
           (CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
           * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
           ORDER BY c.dow)) AS ent
  FROM c JOIN t USING (user_id)
  GROUP BY c.user_id
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
       ROUND(list_sum(list(ent ORDER BY user_id))
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_entropy
FROM e
"""


# ---------------------------------------------------------------------------
# Monthly part coverage
# ---------------------------------------------------------------------------


def q_monthly_part_coverage(sf_dir: str):
    """Per ship month: distinct parts shipped and the share of the part
    catalog they cover."""
    n_parts = int(
        _read(sf_dir, "part", ["p_partkey"])
        .map_batches(
            lambda b: pd.DataFrame(
                {"n": np.array([len(b)], dtype=np.int64)}
            ),
            batch_format="pandas",
        )
        .to_pandas()["n"]
        .sum()
    )
    li = _read(sf_dir, "lineitem", ["l_partkey", "l_shipdate"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "m": (
                    b["l_shipdate"].dt.year.astype(np.int64) * 12
                    + b["l_shipdate"].dt.month.astype(np.int64)
                ),
                "partkey": b["l_partkey"].astype(np.int64),
                "one": np.ones(len(b), dtype=np.int64),
            }
        ).drop_duplicates(subset=["m", "partkey"]),
        batch_format="pandas",
    )
    per_pair = hash_bucket_aggregate(
        li, ["m", "partkey"], [("one", "max")]
    )
    agg = (
        hash_bucket_aggregate(
            per_pair.map_batches(
                lambda b: pd.DataFrame(
                    {
                        "m": b["m"].astype(np.int64),
                        "k": np.ones(len(b), dtype=np.int64),
                    }
                )
                .groupby("m", sort=False)
                .sum()
                .reset_index(),
                batch_format="pandas",
            ),
            ["m"],
            [("k", "sum")],
        )
        .to_pandas()
        .sort_values("m")
    )
    return pd.DataFrame(
        {
            "month_key": agg["m"].astype(np.int64),
            "n_parts_shipped": agg["k_sum"].astype(np.int64),
            "catalog_share": _r6away(
                agg["k_sum"].to_numpy(np.float64) / float(n_parts)
            ),
        }
    ).reset_index(drop=True)


ORACLES111["monthly_part_coverage"] = """
WITH t AS (SELECT COUNT(*) AS np FROM part),
mp AS (
  SELECT DISTINCT CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)
           AS m,
         l_partkey
  FROM lineitem
),
a AS (SELECT m, COUNT(*) AS k FROM mp GROUP BY 1)
SELECT a.m AS month_key,
       CAST(a.k AS BIGINT) AS n_parts_shipped,
       ROUND(CAST(a.k AS DOUBLE) / CAST(t.np AS DOUBLE), 6)
         AS catalog_share
FROM a, t
"""


QUERIES111["sentence_len_cv"] = q_sentence_len_cv
QUERIES111["user_dow_entropy_mean"] = q_user_dow_entropy_mean
QUERIES111["monthly_part_coverage"] = q_monthly_part_coverage
