"""Round-3 batch 56: punctuation, calendar-value and compactness
diagnostics — the terminal-punctuation mix per source (./!/? counts:
declarative vs excited vs interrogative content), mean order value by
day-of-week (is weekend commerce bigger-ticket), and embedding
compactness (the EXACT mean pairwise dot product of quantized vectors
via the ||sum q||^2 identity — no pair enumeration at all).

House parity: punctuation counts are the same literal-char counts
through Python str.count and RE2; value means divide exact cents; the
compactness numerator sum_{i != j} <q_i, q_j> = ||sum_i q_i||^2 -
sum_i ||q_i||^2 is exact integer algebra over the one (dim-sums +
norms) exchange.

Scale contracts: all tables bounded; the compactness identity moves
d + 1 integers per batch, never a pair.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries4 import _quantize_rows
from .queries16 import _cents_col, _read

QUERIES54: dict = {}
ORACLES54: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Terminal-punctuation mix per source
# ---------------------------------------------------------------------------


def q_terminal_punct_mix(sf_dir: str):
    """Per source: counts of '.', '!' and '?' characters and their
    shares of all terminal punctuation — the declarative / excited /
    interrogative content mix. Exact integer character counts through
    one exchange."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        srcs, dots, bangs, qs = [], [], [], []
        for src, text in zip(batch["source"], batch["text"]):
            t = text or ""
            srcs.append(src)
            dots.append(t.count("."))
            bangs.append(t.count("!"))
            qs.append(t.count("?"))
        return pd.DataFrame(
            {
                "source": srcs,
                "d": np.array(dots, dtype=np.int64),
                "b": np.array(bangs, dtype=np.int64),
                "q": np.array(qs, dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"],
        [("d", "sum"), ("b", "sum"), ("q", "sum")],
    ).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        d, b, q = int(r["d_sum"]), int(r["b_sum"]), int(r["q_sum"])
        tot = d + b + q
        if tot == 0:
            continue
        rows.append(
            (
                r["source"],
                d,
                b,
                q,
                float(_r6away(float(d) / float(tot))),
                float(_r6away(float(q) / float(tot))),
            )
        )
    return (
        pd.DataFrame(
            rows,
            columns=["source", "n_period", "n_bang", "n_question",
                     "period_share", "question_share"],
        )
        .astype({"n_period": np.int64, "n_bang": np.int64, "n_question": np.int64})
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES54["terminal_punct_mix"] = """
WITH a AS (
  SELECT source,
         CAST(SUM(length(text) - length(replace(text, '.', '')))
           AS BIGINT) AS d,
         CAST(SUM(length(text) - length(replace(text, '!', '')))
           AS BIGINT) AS b,
         CAST(SUM(length(text) - length(replace(text, '?', '')))
           AS BIGINT) AS q
  FROM documents GROUP BY 1
)
SELECT source,
       d AS n_period, b AS n_bang, q AS n_question,
       ROUND(CAST(d AS DOUBLE) / CAST(d + b + q AS DOUBLE), 6)
         AS period_share,
       ROUND(CAST(q AS DOUBLE) / CAST(d + b + q AS DOUBLE), 6)
         AS question_share
FROM a WHERE d + b + q > 0
"""


# ---------------------------------------------------------------------------
# Order value by day-of-week
# ---------------------------------------------------------------------------


def q_order_value_by_dow(sf_dir: str):
    """Per day-of-week ((epoch_day + 4) % 7, 0 = Sunday): order count
    and mean order value — do certain weekdays carry bigger tickets.
    Exact cents sums; one division."""
    orders = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "dow": (
                    b["o_orderdate"].to_numpy("datetime64[us]").view(np.int64)
                    // DAY_US
                    + 4
                )
                % 7,
                "c": _cents_col(b["o_totalprice"]),
            }
        )
        .assign(n=lambda d: np.ones(len(d), dtype=np.int64))
        .groupby("dow", sort=False)
        .agg(n=("n", "sum"), s=("c", "sum"))
        .reset_index(),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(orders, ["dow"], [("n", "sum"), ("s", "sum")])
        .to_pandas()
        .sort_values("dow")
    )
    mean = [
        float(_r6away(float(int(s)) / float(int(n)) / 100.0))
        for s, n in zip(agg["s_sum"], agg["n_sum"])
    ]
    return pd.DataFrame(
        {
            "dow": agg["dow"].astype(np.int64),
            "n_orders": agg["n_sum"].astype(np.int64),
            "mean_value": mean,
        }
    ).reset_index(drop=True)


ORACLES54["order_value_by_dow"] = """
WITH a AS (
  SELECT (epoch_us(o_orderdate) // 86400000000 + 4) % 7 AS dow,
         COUNT(*) AS n,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s
  FROM orders GROUP BY 1
)
SELECT CAST(dow AS BIGINT) AS dow,
       CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(s AS DOUBLE) / CAST(n AS DOUBLE) / 100.0, 6) AS mean_value
FROM a
"""


# ---------------------------------------------------------------------------
# Embedding compactness (exact mean pairwise dot)
# ---------------------------------------------------------------------------


def q_embedding_compactness(sf_dir: str):
    """Mean pairwise dot product of the quantized embeddings via the
    identity sum_{i != j} <q_i, q_j> = ||sum q||^2 - sum ||q||^2 —
    EXACT integer algebra with no pair enumeration (the O(n^2) pair
    scan collapses to one d-vector + one scalar per batch). High mean
    dot = the corpus points one way; ~0 = isotropic."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        q = _quantize_rows(batch["embedding"])
        d = q.shape[1]
        out = pd.DataFrame(
            {
                "dim": np.arange(d + 1, dtype=np.int64),
                "s": np.concatenate(
                    (q.sum(axis=0), [int((q * q).sum())])
                ).astype(np.int64),
                "n": np.concatenate(
                    (np.zeros(d, dtype=np.int64), [q.shape[0]])
                ),
            }
        )
        return out

    agg = (
        hash_bucket_aggregate(
            ds.map_batches(partial, batch_format="pandas"),
            ["dim"],
            [("s", "sum"), ("n", "sum")],
        )
        .to_pandas()
        .sort_values("dim")
    )
    d = len(agg) - 1
    sums = agg["s_sum"].to_numpy(np.int64)[:d]
    norm2 = int(agg["s_sum"].iloc[d])
    n = int(agg["n_sum"].iloc[d])
    total_sq = 0
    for x in sums:
        total_sq += int(x) * int(x)  # exact python ints
    cross = total_sq - norm2
    pairs = n * (n - 1)
    mean_dot = float(cross) / float(pairs)
    return pd.DataFrame(
        {
            "n_vecs": np.array([n], dtype=np.int64),
            "cross_sum": np.array([cross], dtype=np.int64),
            "mean_pair_dot": [float(_r6away(mean_dot))],
        }
    )


ORACLES54["embedding_compactness"] = """
WITH m AS (
  SELECT embedding,
         list_max(list_transform(embedding, x -> abs(x))) AS ma
  FROM embeddings
),
e AS (
  SELECT unnest(range(0, len(embedding))) AS dim,
         unnest(list_transform(embedding,
           x -> CASE WHEN ma = 0 THEN 0
                     ELSE CAST(ROUND(CAST(x AS DOUBLE) / CAST(ma AS DOUBLE) * 127)
                               AS BIGINT) END)) AS q
  FROM m
),
g AS (
  SELECT dim, CAST(SUM(q) AS BIGINT) AS s, COUNT(*) AS n,
         CAST(SUM(q * q) AS BIGINT) AS q2
  FROM e GROUP BY 1
),
a AS (
  SELECT CAST(SUM(s::HUGEINT * s::HUGEINT) AS BIGINT) AS total_sq,
         CAST(SUM(q2) AS BIGINT) AS norm2,
         MAX(n) AS n
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_vecs,
       CAST(total_sq - norm2 AS BIGINT) AS cross_sum,
       ROUND(CAST(total_sq - norm2 AS DOUBLE)
             / CAST(n::HUGEINT * (n - 1)::HUGEINT AS DOUBLE), 6)
         AS mean_pair_dot
FROM a
"""


QUERIES54["terminal_punct_mix"] = q_terminal_punct_mix
QUERIES54["order_value_by_dow"] = q_order_value_by_dow
QUERIES54["embedding_compactness"] = q_embedding_compactness
