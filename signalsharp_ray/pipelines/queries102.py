"""Round-3 batch 104: diversity-structure operators — the correlation
between a document's character entropy and its length (do longer docs
diversify or repeat), the brand entropy within each part type (how
many brands genuinely compete per category), and the first-seen
timestamp of each event type (stream schema-evolution audit).

House parity: per-doc entropies fold ln over exact char counts
(char-ascending) and the cross-doc Pearson folds doc_id-ascending;
brand entropies fold brand-ascending over exact counts; first-seen is
the integer (ts, event_id) argmin with exact day offsets.

Scale contracts: per-doc reductions run inside map_batches; the
Pearson combine folds bounded per-doc scalars; brand entropy and
first-seen are bounded aggregates.
"""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries14 import _fold
from .queries16 import _read

QUERIES102: dict = {}
ORACLES102: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Doc entropy vs length correlation
# ---------------------------------------------------------------------------


def q_entropy_length_corr(sf_dir: str):
    """One global row: Pearson correlation between per-document
    character Shannon entropy (nats, char-ascending fold over exact
    counts) and character length, folding the five Pearson sums
    doc_id-ascending."""
    docs = _documents(sf_dir, ["doc_id", "text"])

    def perdoc(batch: pd.DataFrame) -> pd.DataFrame:
        ids, ents, lens = [], [], []
        for did, text in zip(batch["doc_id"], batch["text"]):
            t = text or ""
            n = len(t)
            if n == 0:
                continue
            counts = Counter(t)
            terms = []
            for ch in sorted(counts):
                p = float(counts[ch]) / float(n)
                terms.append(p * math.log(p))
            ids.append(int(did))
            ents.append(-_fold(terms))
            lens.append(n)
        return pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "e": np.array(ents, dtype=np.float64),
                "l": np.array(lens, dtype=np.int64),
            }
        )

    per_doc = (
        docs.map_batches(perdoc, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    out_empty = pd.DataFrame(
        {"n_docs": pd.Series(dtype=np.int64),
         "r": pd.Series(dtype=np.float64)}
    )
    n = len(per_doc)
    if n < 2:
        return out_empty
    sx = sy = sxy = sxx = syy = 0.0
    for e, L in zip(per_doc["e"], per_doc["l"]):
        x = float(int(L))
        y = float(e)
        sx = sx + x
        sy = sy + y
        sxy = sxy + x * y
        sxx = sxx + x * x
        syy = syy + y * y
    fn = float(n)
    dx = fn * sxx - sx * sx
    dy = fn * syy - sy * sy
    if dx <= 0.0 or dy <= 0.0:
        return out_empty
    r = (fn * sxy - sx * sy) / (math.sqrt(dx) * math.sqrt(dy))
    return pd.DataFrame(
        {"n_docs": np.array([n], dtype=np.int64), "r": [float(_r6away(r))]}
    )


ORACLES102["entropy_length_corr"] = """
WITH chars AS (
  SELECT doc_id, UNNEST(string_split(COALESCE(text, ''), '')) AS ch
  FROM documents WHERE length(COALESCE(text, '')) > 0
),
cc AS (SELECT doc_id, ch, COUNT(*) AS n FROM chars GROUP BY 1, 2),
dl AS (SELECT doc_id, SUM(n) AS L FROM cc GROUP BY 1),
ent AS (
  SELECT cc.doc_id,
         -list_sum(list(
           (CAST(cc.n AS DOUBLE) / CAST(dl.L AS DOUBLE))
           * ln(CAST(cc.n AS DOUBLE) / CAST(dl.L AS DOUBLE))
           ORDER BY cc.ch)) AS e,
         MAX(dl.L) AS L
  FROM cc JOIN dl USING (doc_id)
  GROUP BY cc.doc_id
),
s AS (
  SELECT COUNT(*) AS n,
         list_sum(list(CAST(L AS DOUBLE) ORDER BY doc_id)) AS sx,
         list_sum(list(e ORDER BY doc_id)) AS sy,
         list_sum(list(CAST(L AS DOUBLE) * e ORDER BY doc_id)) AS sxy,
         list_sum(list(CAST(L AS DOUBLE) * CAST(L AS DOUBLE)
                       ORDER BY doc_id)) AS sxx,
         list_sum(list(e * e ORDER BY doc_id)) AS syy
  FROM ent
)
SELECT CAST(n AS BIGINT) AS n_docs,
       ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx)
                * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS r
FROM s
WHERE n >= 2 AND CAST(n AS DOUBLE) * sxx - sx * sx > 0
  AND CAST(n AS DOUBLE) * syy - sy * sy > 0
"""


# ---------------------------------------------------------------------------
# Brand entropy within part type
# ---------------------------------------------------------------------------


def q_brand_entropy_by_part_type(sf_dir: str):
    """Per p_type: part count, distinct brands, and the Shannon entropy
    (nats) of the brand mix — real multi-brand competition vs nominal."""
    part = _read(sf_dir, "part", ["p_type", "p_brand"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "p_type": batch["p_type"],
                    "brand": batch["p_brand"],
                    "n": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby(["p_type", "brand"], sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            part.map_batches(partial, batch_format="pandas"),
            ["p_type", "brand"],
            [("n", "sum")],
        )
        .to_pandas()
        .sort_values(["p_type", "brand"])
    )
    rows = []
    for pt, g in agg.groupby("p_type", sort=True):
        tot = int(g["n_sum"].sum())
        terms = []
        for _, r in g.iterrows():
            p = float(int(r["n_sum"])) / float(tot)
            terms.append(p * math.log(p))
        rows.append((pt, tot, len(g), float(_r6away(-_fold(terms)))))
    return pd.DataFrame(
        rows, columns=["p_type", "n_parts", "n_brands", "brand_entropy"]
    ).astype({"n_parts": np.int64, "n_brands": np.int64})


ORACLES102["brand_entropy_by_part_type"] = """
WITH c AS (
  SELECT p_type, p_brand AS brand, COUNT(*) AS n FROM part GROUP BY 1, 2
),
t AS (SELECT p_type, SUM(n) AS tot, COUNT(*) AS k FROM c GROUP BY 1)
SELECT c.p_type,
       CAST(MAX(t.tot) AS BIGINT) AS n_parts,
       CAST(MAX(t.k) AS BIGINT) AS n_brands,
       ROUND(-list_sum(list(
         (CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         * ln(CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE))
         ORDER BY c.brand)), 6) AS brand_entropy
FROM c JOIN t USING (p_type)
GROUP BY c.p_type
"""


# ---------------------------------------------------------------------------
# First-seen timestamp per type
# ---------------------------------------------------------------------------


def q_type_first_seen(sf_dir: str):
    """Per event_type: the first event timestamp (exact (ts, event_id)
    argmin) and whole days since the stream's global first event."""
    ev = _events(sf_dir, ["event_type", "ts", "event_id"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "event_type": b["event_type"],
                "us": b["ts"].astype("datetime64[us]").astype("int64"),
            }
        ),
        batch_format="pandas",
    )
    firsts = (
        hash_bucket_aggregate(ev, ["event_type"], [("us", "min")])
        .to_pandas()
        .sort_values("event_type")
    )
    out_empty = pd.DataFrame(
        {"event_type": pd.Series(dtype=object),
         "first_ts": pd.Series(dtype="datetime64[us]"),
         "days_from_start": pd.Series(dtype=np.int64)}
    )
    if firsts.empty:
        return out_empty
    start = int(firsts["us_min"].min())
    return pd.DataFrame(
        {
            "event_type": firsts["event_type"].astype(str),
            "first_ts": firsts["us_min"]
            .astype(np.int64)
            .to_numpy()
            .astype("datetime64[us]"),
            "days_from_start": (
                (firsts["us_min"].astype(np.int64) - start) // DAY_US
            ).astype(np.int64),
        }
    ).reset_index(drop=True)


ORACLES102["type_first_seen"] = """
WITH f AS (
  SELECT event_type, MIN(epoch_us(ts)) AS us FROM events GROUP BY 1
),
g AS (SELECT MIN(us) AS start FROM f)
SELECT f.event_type,
       make_timestamp(f.us) AS first_ts,
       CAST((f.us - g.start) // 86400000000 AS BIGINT) AS days_from_start
FROM f, g
"""


QUERIES102["entropy_length_corr"] = q_entropy_length_corr
QUERIES102["brand_entropy_by_part_type"] = q_brand_entropy_by_part_type
QUERIES102["type_first_seen"] = q_type_first_seen
