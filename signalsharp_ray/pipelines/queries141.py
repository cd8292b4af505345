"""Round-4 batch 141: corpus ecology — Bray-Curtis dissimilarity
between every pair of sources' token-count profiles (the abundance-aware
complement of the Jaccard family: 0 = identical mixes, 1 = disjoint)
and the Chao1 vocabulary-richness estimator per source (how many words
a source WOULD show given infinite sampling, from its hapax/dis
legomena counts).

House parity: pair minima, totals, V/F1/F2 counts are exact integers;
Bray-Curtis and Chao1 are one transcribed float expression each.

Scale contracts: token counts reduce through the standard bucketed
exchange; the pairwise min-sum reduces inside token-complete buckets
(bucketed by the token, so a token's per-source row group never splits)
and exchanges only (source_a, source_b, partial_min) rows — the
source-pair matrix is catalog-bounded."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away

QUERIES141: dict = {}
ORACLES141: dict = {}


def _source_token_counts(sf_dir: str):
    """(token, source, n_sum) bucketed by TOKEN so each token's rows
    stay together for the pairwise fold."""

    def toks(batch: pd.DataFrame) -> pd.DataFrame:
        rows_src: list = []
        rows_tok: list = []
        for src, t in zip(batch["source"], batch["text"].fillna("")):
            for w in t.split():
                rows_src.append(src)
                rows_tok.append(w)
        return pd.DataFrame(
            {
                "token": rows_tok,
                "source": rows_src,
                "n": np.ones(len(rows_tok), dtype=np.int64),
            }
        )

    return hash_bucket_aggregate(
        _documents(sf_dir, ["source", "text"]).map_batches(
            toks, batch_format="pandas"
        ),
        ["token", "source"],
        [("n", "sum")],
        bucket_cols=["token"],
    )


# ---------------------------------------------------------------------------
# Bray-Curtis dissimilarity between sources
# ---------------------------------------------------------------------------


def q_bray_curtis_sources(sf_dir: str):
    """Per source pair (a < b): BC = 1 - 2*sum_t min(c_a(t), c_b(t)) /
    (N_a + N_b) over token counts — the abundance-weighted mix distance
    (two sources can share every word yet be far apart if the
    frequencies differ). Pair minima fold inside token-complete buckets;
    only 190-ish (pair, partial) rows cross the final exchange."""
    counts = _source_token_counts(sf_dir)

    def pair_mins(batch: pd.DataFrame) -> pd.DataFrame:
        out: dict = {}
        for _, g in batch.groupby("token", sort=False):
            srcs = g["source"].to_numpy()
            ns = g["n_sum"].to_numpy(np.int64)
            order = np.argsort(srcs)
            srcs, ns = srcs[order], ns[order]
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    key = (srcs[i], srcs[j])
                    out[key] = out.get(key, 0) + int(
                        min(ns[i], ns[j])
                    )
        if not out:
            return pd.DataFrame(
                {
                    "sa": pd.Series([], dtype=object),
                    "sb": pd.Series([], dtype=object),
                    "minsum": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "sa": [k[0] for k in out],
                "sb": [k[1] for k in out],
                "minsum": np.array(list(out.values()), dtype=np.int64),
            }
        )

    mins = (
        hash_bucket_aggregate(
            counts.map_batches(pair_mins, batch_format="pandas", batch_size=None),
            ["sa", "sb"],
            [("minsum", "sum")],
        )
        .to_pandas()
    )

    def totals(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "n": batch["n_sum"].to_numpy(np.int64),
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    tot = (
        hash_bucket_aggregate(
            counts.map_batches(totals, batch_format="pandas"),
            ["source"],
            [("n", "sum")],
        )
        .to_pandas()
        .set_index("source")["n_sum"]
    )
    rows = []
    for _, r in mins.iterrows():
        sa, sb = r["sa"], r["sb"]
        ms = int(r["minsum_sum"])
        ta, tb = int(tot.loc[sa]), int(tot.loc[sb])
        bc = 1.0 - 2.0 * float(ms) / float(ta + tb)
        rows.append((sa, sb, ms, ta, tb, float(_r6away(bc))))
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "min_sum", "n_a", "n_b",
                 "bray_curtis"],
    ).astype({"min_sum": np.int64, "n_a": np.int64, "n_b": np.int64})


ORACLES141["bray_curtis_sources"] = """
WITH t AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
c AS (SELECT source, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
tot AS (SELECT source, CAST(SUM(n) AS BIGINT) AS total FROM c GROUP BY 1),
pairs AS (
  SELECT a.source AS sa, b.source AS sb,
         CAST(SUM(least(a.n, b.n)) AS BIGINT) AS min_sum
  FROM c a JOIN c b ON b.token = a.token AND b.source > a.source
  GROUP BY 1, 2
)
SELECT p.sa AS source_a, p.sb AS source_b, p.min_sum,
       ta.total AS n_a, tb.total AS n_b,
       ROUND(CAST(1.0 AS DOUBLE)
             - CAST(2.0 AS DOUBLE) * CAST(p.min_sum AS DOUBLE)
               / CAST(ta.total + tb.total AS DOUBLE), 6) AS bray_curtis
FROM pairs p
JOIN tot ta ON ta.source = p.sa
JOIN tot tb ON tb.source = p.sb
"""


# ---------------------------------------------------------------------------
# Chao1 vocabulary richness
# ---------------------------------------------------------------------------


def q_chao1_richness(sf_dir: str):
    """Per source: observed vocabulary V, hapax count F1, dis-legomena
    count F2, and the Chao1 richness estimate V + F1*(F1-1)/(2*(F2+1))
    (the bias-corrected form, defined even when F2 = 0) — how much
    vocabulary the source is still hiding. All counts exact; one
    transcribed expression."""
    counts = _source_token_counts(sf_dir)

    def feats(batch: pd.DataFrame) -> pd.DataFrame:
        n = batch["n_sum"].to_numpy(np.int64)
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "v": np.ones(len(batch), dtype=np.int64),
                    "f1": (n == 1).astype(np.int64),
                    "f2": (n == 2).astype(np.int64),
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    agg = hash_bucket_aggregate(
        counts.map_batches(feats, batch_format="pandas"),
        ["source"],
        [("v", "sum"), ("f1", "sum"), ("f2", "sum")],
    ).to_pandas()
    v = agg["v_sum"].to_numpy(np.int64)
    f1 = agg["f1_sum"].to_numpy(np.int64)
    f2 = agg["f2_sum"].to_numpy(np.int64)
    chao = v.astype(np.float64) + f1.astype(np.float64) * (
        f1.astype(np.float64) - 1.0
    ) / (2.0 * (f2.astype(np.float64) + 1.0))
    return pd.DataFrame(
        {
            "source": agg["source"].to_numpy(),
            "vocab": v,
            "f1_hapax": f1,
            "f2_dis": f2,
            "chao1": _r6away(chao),
        }
    )


ORACLES141["chao1_richness"] = """
WITH t AS (
  SELECT source,
         unnest(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
c AS (SELECT source, token, COUNT(*) AS n FROM t GROUP BY 1, 2),
g AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS v,
         CAST(COUNT(*) FILTER (WHERE n = 1) AS BIGINT) AS f1,
         CAST(COUNT(*) FILTER (WHERE n = 2) AS BIGINT) AS f2
  FROM c GROUP BY 1
)
SELECT source, v AS vocab, f1 AS f1_hapax, f2 AS f2_dis,
       ROUND(CAST(v AS DOUBLE)
             + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE)
                                     - CAST(1.0 AS DOUBLE))
               / (CAST(2.0 AS DOUBLE)
                  * (CAST(f2 AS DOUBLE) + CAST(1.0 AS DOUBLE))), 6) AS chao1
FROM g
"""


QUERIES141["bray_curtis_sources"] = q_bray_curtis_sources
QUERIES141["chao1_richness"] = q_chao1_richness
