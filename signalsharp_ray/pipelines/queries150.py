"""Round-4 batch 150: vocabulary Jaccard between sources — the
presence/absence companion of bray_curtis_sources (Bray-Curtis weighs
abundance; this asks only whether the word EXISTS in both vocabularies)
— together they separate "same words, different frequencies" from
"different words".

House parity: intersection and per-source vocabulary counts are exact
integers folded inside token-complete buckets; union = |Va| + |Vb| -
intersection; Jaccard is one shared division.

Scale contracts: the same token-bucketed exchange as bray_curtis; only
(source_a, source_b, n) and per-source vocab counts cross the wire."""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _r6away
from .queries141 import _source_token_counts

QUERIES150: dict = {}
ORACLES150: dict = {}


def q_vocab_jaccard_sources(sf_dir: str):
    """Per source pair (a < b): |vocab_a INTERSECT vocab_b|, the two
    vocabulary sizes, and the Jaccard similarity over the union —
    1 = identical word lists regardless of frequency. Pairs sharing no
    word are omitted (stated; their Jaccard is 0)."""
    counts = _source_token_counts(sf_dir)

    def pair_hits(batch: pd.DataFrame) -> pd.DataFrame:
        out: dict = {}
        for _, g in batch.groupby("token", sort=False):
            srcs = sorted(set(g["source"].tolist()))
            for i in range(len(srcs)):
                for j in range(i + 1, len(srcs)):
                    key = (srcs[i], srcs[j])
                    out[key] = out.get(key, 0) + 1
        if not out:
            return pd.DataFrame(
                {
                    "sa": pd.Series([], dtype=object),
                    "sb": pd.Series([], dtype=object),
                    "n": pd.Series([], dtype=np.int64),
                }
            )
        return pd.DataFrame(
            {
                "sa": [k[0] for k in out],
                "sb": [k[1] for k in out],
                "n": np.array(list(out.values()), dtype=np.int64),
            }
        )

    inter = hash_bucket_aggregate(
        counts.map_batches(
            pair_hits, batch_format="pandas", batch_size=None
        ),
        ["sa", "sb"],
        [("n", "sum")],
    ).to_pandas()

    def vocab(batch: pd.DataFrame) -> pd.DataFrame:
        return (
            pd.DataFrame(
                {
                    "source": batch["source"],
                    "v": np.ones(len(batch), dtype=np.int64),
                }
            )
            .groupby("source", sort=False)
            .sum()
            .reset_index()
        )

    sizes = (
        hash_bucket_aggregate(
            counts.map_batches(vocab, batch_format="pandas"),
            ["source"],
            [("v", "sum")],
        )
        .to_pandas()
        .set_index("source")["v_sum"]
    )
    rows = []
    for _, r in inter.iterrows():
        sa, sb = r["sa"], r["sb"]
        ix = int(r["n_sum"])
        va, vb = int(sizes.loc[sa]), int(sizes.loc[sb])
        union = va + vb - ix
        rows.append(
            (
                sa,
                sb,
                ix,
                va,
                vb,
                float(_r6away(float(ix) / float(union))),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_shared", "vocab_a", "vocab_b",
                 "jaccard"],
    ).astype(
        {"n_shared": np.int64, "vocab_a": np.int64, "vocab_b": np.int64}
    )


ORACLES150["vocab_jaccard_sources"] = """
WITH t AS (
  SELECT DISTINCT source,
         unnest(list_filter(regexp_split_to_array(COALESCE(text, ''), '\\s+'),
                            x -> x <> '')) AS token
  FROM documents
),
v AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS vocab FROM t GROUP BY 1),
pairs AS (
  SELECT a.source AS sa, b.source AS sb, CAST(COUNT(*) AS BIGINT) AS ix
  FROM t a JOIN t b ON b.token = a.token AND b.source > a.source
  GROUP BY 1, 2
)
SELECT p.sa AS source_a, p.sb AS source_b, p.ix AS n_shared,
       va.vocab AS vocab_a, vb.vocab AS vocab_b,
       ROUND(CAST(p.ix AS DOUBLE)
             / CAST(va.vocab + vb.vocab - p.ix AS DOUBLE), 6) AS jaccard
FROM pairs p
JOIN v va ON va.source = p.sa
JOIN v vb ON vb.source = p.sb
"""


QUERIES150["vocab_jaccard_sources"] = q_vocab_jaccard_sources
