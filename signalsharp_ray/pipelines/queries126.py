"""Round-4 batch 126: tokenizer-facing corpus statistics — a GPT-2-style
pretokenizer estimate next to the whitespace count (the brief's
"token counting: whitespace + a BPE-ish regex"), the closed-vocabulary
OOV rate against the corpus's own top-1000 tokens (tokenizer coverage),
and the token-length histogram per language (the subword-granularity
diagnostic).

House parity: the BPE-ish pattern is ASCII-only with mutually exclusive
alternation branches (no lookahead, RE2-safe), so Python re and DuckDB
count identical non-overlapping matches — the readability/bm25 C-regex
contract; the vocabulary cut is the deterministic (count DESC, token
ASC) top-K already oracle-verified in `vocabulary`; OOV and length
counts are exact integers with one shared division per row.

Scale contracts: per-document regex counts reduce through one
per-source exchange; the vocabulary builds through the standard
bucketed token exchange and the membership join runs co-partitioned on
the token (bucketed_join) — the vocab never sits on the driver."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away

QUERIES126: dict = {}
ORACLES126: dict = {}

BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
_BPE_RE = re.compile(BPE_PATTERN)
OOV_VOCAB_K = 1000


# ---------------------------------------------------------------------------
# BPE-ish token estimate
# ---------------------------------------------------------------------------


def q_bpe_token_estimate(sf_dir: str):
    """Per source: whitespace token count vs a GPT-2-style pretokenizer
    estimate (letter runs, digit runs, punctuation runs, each with an
    optional leading space, plus whitespace runs) and the fertility
    ratio bpe/ws — the first number a tokenizer-budget planner asks for.
    Both counts are exact regex-match integers; the ratio is one shared
    division."""

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        texts = batch["text"].fillna("")
        ws = texts.str.split().str.len().fillna(0).astype(np.int64)
        bpe = texts.map(lambda t: len(_BPE_RE.findall(t))).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "n_docs": np.ones(len(batch), dtype=np.int64),
                    "ws_tokens": ws,
                    "bpe_tokens": bpe,
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _documents(sf_dir, ["source", "text"]).map_batches(
            feats, batch_format="pandas"
        ),
        ["source"],
        [("n_docs", "sum"), ("ws_tokens", "sum"), ("bpe_tokens", "sum")],
    ).to_pandas()
    ws = agg["ws_tokens_sum"].to_numpy(np.int64)
    bpe = agg["bpe_tokens_sum"].to_numpy(np.int64)
    keep = ws > 0
    return pd.DataFrame(
        {
            "source": agg["source"].to_numpy()[keep],
            "n_docs": agg["n_docs_sum"].to_numpy(np.int64)[keep],
            "ws_tokens": ws[keep],
            "bpe_tokens": bpe[keep],
            "fertility": _r6away(
                bpe[keep].astype(np.float64) / ws[keep].astype(np.float64)
            ),
        }
    )


ORACLES126["bpe_token_estimate"] = f"""
WITH per AS (
  SELECT source,
         len(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                         x -> x <> '')) AS ws,
         len(regexp_extract_all(COALESCE(text, ''), '{BPE_PATTERN}')) AS bpe
  FROM documents
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(ws) AS BIGINT) AS ws_tokens,
       CAST(SUM(bpe) AS BIGINT) AS bpe_tokens,
       ROUND(CAST(SUM(bpe) AS DOUBLE) / CAST(SUM(ws) AS DOUBLE), 6)
         AS fertility
FROM per GROUP BY 1
HAVING SUM(ws) > 0
"""


# ---------------------------------------------------------------------------
# Closed-vocabulary OOV rate
# ---------------------------------------------------------------------------


def q_oov_rate(sf_dir: str):
    """Per source: the share of whitespace-token OCCURRENCES outside the
    corpus's own top-1000 vocabulary (count DESC, token ASC cut) — the
    coverage a closed-vocab tokenizer would achieve. The vocabulary
    builds through the standard bucketed token exchange; membership
    joins back co-partitioned on the token; OOV counts are exact
    integers."""

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        rows_src: list = []
        rows_tok: list = []
        for src, t in zip(batch["source"], batch["text"].fillna("")):
            for w in t.split():
                rows_src.append(src)
                rows_tok.append(w)
        return pd.DataFrame(
            {
                "source": rows_src,
                "token": rows_tok,
                "n": np.ones(len(rows_tok), dtype=np.int64),
            }
        )

    pairs = hash_bucket_aggregate(
        _documents(sf_dir, ["source", "text"]).map_batches(
            toks, batch_format="pandas"
        ),
        ["source", "token"],
        [("n", "sum")],
    )
    totals = hash_bucket_aggregate(pairs, ["token"], [("n_sum", "sum")])

    def topk(batch: pd.DataFrame) -> pd.DataFrame:
        # per-bucket partial top-K; the driver merges K x n_buckets rows
        b = batch.sort_values(
            ["n_sum_sum", "token"], ascending=[False, True]
        ).head(OOV_VOCAB_K)
        return b

    vocab = (
        totals.map_batches(topk, batch_format="pandas")
        .to_pandas()
        .sort_values(["n_sum_sum", "token"], ascending=[False, True])
        .head(OOV_VOCAB_K)
    )
    vocab_set = pd.DataFrame(
        {"token": vocab["token"].to_numpy(), "in_vocab": 1}
    )
    import ray.data as rd

    joined = bucketed_join(
        pairs, rd.from_pandas(vocab_set), on=["token"], how="left"
    )

    def reduce_src(batch: pd.DataFrame) -> pd.DataFrame:
        inv = batch["in_vocab"].fillna(0).to_numpy(np.int64)
        n = batch["n_sum"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "total": n,
                    "oov": np.where(inv == 0, n, 0).astype(np.int64),
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        joined.map_batches(reduce_src, batch_format="pandas"),
        ["source"],
        [("total", "sum"), ("oov", "sum")],
    ).to_pandas()
    tot = agg["total_sum"].to_numpy(np.int64)
    oov = agg["oov_sum"].to_numpy(np.int64)
    return pd.DataFrame(
        {
            "source": agg["source"].to_numpy(),
            "n_tokens": tot,
            "n_oov": oov,
            "oov_rate": _r6away(
                oov.astype(np.float64) / tot.astype(np.float64)
            ),
        }
    )


ORACLES126["oov_rate"] = f"""
WITH t AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
c AS (SELECT token, COUNT(*) AS n FROM t GROUP BY 1),
v AS (
  SELECT token FROM c
  QUALIFY ROW_NUMBER() OVER (ORDER BY n DESC, token ASC) <= {OOV_VOCAB_K}
)
SELECT t.source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(COUNT(*) FILTER (WHERE v.token IS NULL) AS BIGINT) AS n_oov,
       ROUND(CAST(COUNT(*) FILTER (WHERE v.token IS NULL) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS oov_rate
FROM t LEFT JOIN v ON v.token = t.token
GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Token-length histogram per language
# ---------------------------------------------------------------------------


def q_token_length_histogram(sf_dir: str):
    """Per (lang, token character length): occurrence count and the
    share within the language — the granularity profile subword
    tokenizers are tuned against. Pure integer counts; one shared
    division per row."""

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        rows_lang: list = []
        rows_len: list = []
        for lang, t in zip(batch["lang"], batch["text"].fillna("")):
            for w in t.split():
                rows_lang.append(lang)
                rows_len.append(len(w))
        return (
            pd.DataFrame(
                {
                    "lang": rows_lang,
                    "tok_len": np.array(rows_len, dtype=np.int64),
                    "n": np.ones(len(rows_len), dtype=np.int64),
                }
            )
            .groupby(["lang", "tok_len"], sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        _documents(sf_dir, ["lang", "text"]).map_batches(
            feats, batch_format="pandas"
        ),
        ["lang", "tok_len"],
        [("n", "sum")],
    ).to_pandas()
    totals = agg.groupby("lang")["n_sum"].transform("sum")
    return pd.DataFrame(
        {
            "lang": agg["lang"].to_numpy(),
            "tok_len": agg["tok_len"].to_numpy(np.int64),
            "n_tokens": agg["n_sum"].to_numpy(np.int64),
            "share": _r6away(
                agg["n_sum"].to_numpy(np.float64)
                / totals.to_numpy(np.float64)
            ),
        }
    )


ORACLES126["token_length_by_lang"] = """
WITH t AS (
  SELECT lang,
         unnest(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
g AS (
  SELECT lang, CAST(len(token) AS BIGINT) AS tok_len, COUNT(*) AS n
  FROM t GROUP BY 1, 2
)
SELECT lang, tok_len, CAST(n AS BIGINT) AS n_tokens,
       ROUND(CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY lang) AS DOUBLE), 6) AS share
FROM g
"""


QUERIES126["bpe_token_estimate"] = q_bpe_token_estimate
QUERIES126["oov_rate"] = q_oov_rate
QUERIES126["token_length_by_lang"] = q_token_length_histogram
