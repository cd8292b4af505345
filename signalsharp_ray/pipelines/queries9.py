"""Round-3 batch 11: corpus-shape statistics for training-data curation —
token-length histogram per source, hapax-legomena ratio (vocabulary
freshness per feed), character-trigram profiles per language (the feature
table behind n-gram language ID), and per-dimension embedding statistics
(the sanity table a vector pipeline checks before indexing).

House parity: token counts are integer end-to-end; the only float per
output row is a single transcribed division (hapax ratio, dim mean/var);
embeddings quantize to exact 1e6-scaled int64 micro-units with half-away
rounding on both engines BEFORE any sum, so component sums are block-
layout-independent (the label_centroids rule).

Scale contracts: token/trigram exchanges move (key, count) rows bounded
by vocabulary x sources / alphabet³ x languages, never the corpus; the
embedding reduction collapses each batch to 64 partial rows.
"""

from __future__ import annotations

import re
from collections import Counter

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away

QUERIES9: dict = {}
ORACLES9: dict = {}

_TOKEN_RE = re.compile(r"[a-z0-9_]+")


# ---------------------------------------------------------------------------
# Token-length histogram per source
# ---------------------------------------------------------------------------


def q_token_length_histogram(sf_dir: str):
    """Per (source, token length): total token occurrences — the length
    profile that exposes tokenizer-hostile feeds (single-char floods,
    unbroken blobs). Integer counts end-to-end."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: Counter = Counter()
        for src, text in zip(batch["source"], batch["text"]):
            for tok in _TOKEN_RE.findall((text or "").lower()):
                rows[(src, len(tok))] += 1
        if not rows:
            return pd.DataFrame(
                {"source": pd.Series([], dtype=str),
                 "token_len": pd.Series([], dtype=np.int64),
                 "n_tokens": pd.Series([], dtype=np.int64)}
            )
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "token_len": np.array([k[1] for k in keys], dtype=np.int64),
                "n_tokens": np.array([rows[k] for k in keys], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "token_len"],
        [("n_tokens", "sum")],
    ).to_pandas()  # sources x max-token-length bounded
    return pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "token_len": agg["token_len"].astype(np.int64),
            "n_tokens": agg["n_tokens_sum"].astype(np.int64),
        }
    )


ORACLES9["token_length_histogram"] = """
SELECT source,
       CAST(length(term) AS BIGINT) AS token_len,
       COUNT(*) AS n_tokens
FROM (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9_]+')) AS term
  FROM documents
)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Hapax-legomena ratio per source
# ---------------------------------------------------------------------------


def q_hapax_ratio_by_source(sf_dir: str):
    """Per source: vocabulary size, hapax count (tokens occurring exactly
    once in that source), and their ratio — the classic freshness /
    boilerplate discriminator (template-heavy feeds have tiny hapax
    ratios). One transcribed division per source; counts exact."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: Counter = Counter()
        for src, text in zip(batch["source"], batch["text"]):
            for tok in _TOKEN_RE.findall((text or "").lower()):
                rows[(src, tok)] += 1
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "token": [k[1] for k in keys],
                "n": np.array([rows[k] for k in keys], dtype=np.int64),
            }
        )

    per_token = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "token"],
        [("n", "sum")],
    )

    def vocab_partial(batch: pd.DataFrame) -> pd.DataFrame:
        g = batch.groupby("source", sort=False).agg(
            vocab=("n_sum", "size"),
            hapax=("n_sum", lambda s: int((s == 1).sum())),
        )
        return g.reset_index().astype({"vocab": np.int64, "hapax": np.int64})

    agg = hash_bucket_aggregate(
        per_token.map_batches(vocab_partial, batch_format="pandas"),
        ["source"],
        [("vocab", "sum"), ("hapax", "sum")],
    ).to_pandas()  # source-bounded
    v = agg["vocab_sum"].to_numpy(np.int64)
    h = agg["hapax_sum"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "source": agg["source"].astype(str),
            "vocab": v,
            "hapax": h,
            "hapax_ratio": _r6away(h.astype(np.float64) / v.astype(np.float64)),
        }
    )


ORACLES9["hapax_ratio_by_source"] = """
WITH t AS (
  SELECT source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')), '[a-z0-9_]+')) AS term
  FROM documents
),
c AS (SELECT source, term, COUNT(*) AS n FROM t GROUP BY 1, 2)
SELECT source,
       COUNT(*) AS vocab,
       CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       ROUND(CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS hapax_ratio
FROM c GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Character-trigram profile per language
# ---------------------------------------------------------------------------


def q_char_trigram_profile(sf_dir: str, k: int = 5):
    """Top-k character trigrams per language (raw text, spaces included)
    — the feature table an n-gram language identifier is trained on
    (language_id applies such a profile; this builds one). Deterministic
    ties: count DESC, then trigram ascending. Integer counts; the
    (language, trigram) table is alphabet³-bounded."""
    docs = _documents(sf_dir, ["lang", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: Counter = Counter()
        for lang, text in zip(batch["lang"], batch["text"]):
            t = text or ""
            for i in range(len(t) - 2):
                rows[(lang, t[i : i + 3])] += 1
        keys = list(rows)
        return pd.DataFrame(
            {
                "lang": [x[0] for x in keys],
                "gram": [x[1] for x in keys],
                "n": np.array([rows[x] for x in keys], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["lang", "gram"],
        [("n", "sum")],
    ).to_pandas()  # languages x alphabet³ bounded
    agg = agg.sort_values(
        ["lang", "n_sum", "gram"], ascending=[True, False, True]
    )
    top = agg.groupby("lang", sort=False).head(k)
    top = top.assign(
        rank=top.groupby("lang", sort=False).cumcount().to_numpy(np.int64) + 1
    )
    return pd.DataFrame(
        {
            "lang": top["lang"].astype(str),
            "rank": top["rank"].astype(np.int64),
            "gram": top["gram"].astype(str),
            "n": top["n_sum"].astype(np.int64),
        }
    )


ORACLES9["char_trigram_profile"] = """
WITH g AS (
  SELECT lang,
         UNNEST(list_transform(range(0, greatest(length(text) - 2, 0)),
                               i -> substr(text, CAST(i AS INT) + 1, 3))) AS gram
  FROM documents
),
c AS (SELECT lang, gram, COUNT(*) AS n FROM g GROUP BY 1, 2)
SELECT lang,
       CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, gram) AS BIGINT) AS rank,
       gram, n
FROM c
QUALIFY ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, gram) <= 5
"""


# ---------------------------------------------------------------------------
# Per-dimension embedding statistics
# ---------------------------------------------------------------------------


def q_embedding_dim_stats(sf_dir: str):
    """Per embedding dimension: count, mean and population variance of the
    1e6-scaled micro-unit quantization — the drift/degeneracy sanity table
    (a dead dimension has ~zero variance; a scale bug shows in the means).
    Quantizing before summation makes the partials exact integers and the
    result block-layout-independent; mean/var are in micro-units.

    Scale: each batch collapses to 64 partial rows (s, q², n per dim);
    the int64 q² sum is safe to ~10^8 vectors per 64 dims (|q| <= ~10^6),
    beyond which the partials would widen to per-batch HUGEINT strings —
    documented, not needed at any test SF."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        m = np.stack([np.asarray(e, dtype=np.float32) for e in batch["embedding"]])
        r = m.astype(np.float64) * 1e6
        q = (np.sign(r) * np.floor(np.abs(r) + 0.5)).astype(np.int64)
        return pd.DataFrame(
            {
                "dim": np.arange(q.shape[1], dtype=np.int64),
                "s": q.sum(axis=0),
                "qq": (q * q).sum(axis=0),
                "n": np.full(q.shape[1], q.shape[0], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        ds.map_batches(partial, batch_format="pandas"),
        ["dim"],
        [("s", "sum"), ("qq", "sum"), ("n", "sum")],
    ).to_pandas()  # 64 rows
    s = agg["s_sum"].to_numpy(np.int64).astype(np.float64)
    qq = agg["qq_sum"].to_numpy(np.int64).astype(np.float64)
    n = agg["n_sum"].to_numpy(np.int64).astype(np.float64)
    return pd.DataFrame(
        {
            "dim": agg["dim"].astype(np.int64),
            "n": agg["n_sum"].astype(np.int64),
            "mean_q": _r6away(s / n),
            "var_q": _r6away((qq - s * s / n) / n),
        }
    )


ORACLES9["embedding_dim_stats"] = """
WITH q AS (
  SELECT unnest(range(0, len(embedding))) AS dim,
         unnest(list_transform(
           embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))) AS q
  FROM embeddings
),
a AS (
  SELECT dim, CAST(SUM(q) AS BIGINT) AS s,
         CAST(SUM(q * q) AS BIGINT) AS qq, COUNT(*) AS n
  FROM q GROUP BY 1
)
SELECT CAST(dim AS BIGINT) AS dim, n,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_q,
       ROUND((CAST(qq AS DOUBLE)
              - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
             / CAST(n AS DOUBLE), 6) AS var_q
FROM a
"""


QUERIES9["token_length_histogram"] = q_token_length_histogram
QUERIES9["hapax_ratio_by_source"] = q_hapax_ratio_by_source
QUERIES9["char_trigram_profile"] = q_char_trigram_profile
QUERIES9["embedding_dim_stats"] = q_embedding_dim_stats
