"""Round-3 batch 55: frequency-spectrum and basket-shape diagnostics —
the token frequency-of-frequencies spectrum (how many vocabulary types
occur exactly k times, k = 1..10 plus the tail — the table Good-Turing
smoothing and vocabulary-budget models read), and the correlation
between an order's line count and its total value (do bigger baskets
mean bigger checks).

House parity: the spectrum is pure integer counting over the one
(token) count exchange; the correlation combines exact integer power
sums (line counts are small ints, totals are cents with 2^32-limb
squares).

Scale contracts: the spectrum table is 11 rows; per-order reductions
are one exchange each.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import bucketed_join, hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries16 import _TOKEN_RE, _cents_col, _read

QUERIES53: dict = {}
ORACLES53: dict = {}

SPECTRUM_MAX_K = 10


# ---------------------------------------------------------------------------
# Token frequency-of-frequencies spectrum
# ---------------------------------------------------------------------------


def q_token_freq_spectrum(sf_dir: str):
    """How many vocabulary types occur exactly k times (k = 1..10,
    then '11+' pooled as k = 11) — the frequency spectrum behind
    Good-Turing mass estimates and hapax analysis. Counts are exact
    integers through one token exchange."""
    docs = _documents(sf_dir, ["text"])

    def tok_counts(batch: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {}
        for text in batch["text"]:
            for tok in _TOKEN_RE.findall((text or "").lower()):
                rows[tok] = rows.get(tok, 0) + 1
        keys = list(rows)
        return pd.DataFrame(
            {"tok": keys, "m": np.array([rows[t] for t in keys], dtype=np.int64)}
        )

    counts = hash_bucket_aggregate(
        docs.map_batches(tok_counts, batch_format="pandas"), ["tok"], [("m", "sum")]
    )
    spectrum = hash_bucket_aggregate(
        counts.map_batches(
            lambda b: pd.DataFrame(
                {
                    "k": np.minimum(
                        b["m_sum"].astype(np.int64), SPECTRUM_MAX_K + 1
                    ),
                    "c": np.ones(len(b), dtype=np.int64),
                }
            ),
            batch_format="pandas",
        ),
        ["k"],
        [("c", "sum")],
    ).to_pandas()
    total = int(spectrum["c_sum"].sum())
    spectrum = spectrum.sort_values("k")
    share = [
        float(_r6away(float(int(c)) / float(total))) for c in spectrum["c_sum"]
    ]
    return pd.DataFrame(
        {
            "k": spectrum["k"].astype(np.int64),
            "n_types": spectrum["c_sum"].astype(np.int64),
            "vocab_share": share,
        }
    ).reset_index(drop=True)


ORACLES53["token_freq_spectrum"] = f"""
WITH t AS (
  SELECT UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{{L}}\\p{{N}}_]+')) AS tok
  FROM documents
),
c AS (SELECT tok, COUNT(*) AS m FROM t GROUP BY 1),
s AS (
  SELECT LEAST(m, {SPECTRUM_MAX_K} + 1) AS k, COUNT(*) AS n
  FROM c GROUP BY 1
)
SELECT CAST(k AS BIGINT) AS k,
       CAST(n AS BIGINT) AS n_types,
       ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6)
         AS vocab_share
FROM s
"""


# ---------------------------------------------------------------------------
# Order size vs value correlation
# ---------------------------------------------------------------------------


def q_order_size_value_corr(sf_dir: str):
    """Pearson correlation between an order's lineitem count and its
    total price — do bigger baskets mean proportionally bigger checks.
    Line counts reduce through one exchange, join the header
    co-partitioned; power sums are exact (2^32 limbs for cents
    squares and cross products)."""
    li = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
        lambda b: pd.DataFrame({"orderkey": b["l_orderkey"].astype(np.int64)})
        .groupby("orderkey", sort=False)
        .size()
        .reset_index(name="k")
        .astype({"k": np.int64}),
        batch_format="pandas",
    )
    per_order = hash_bucket_aggregate(li, ["orderkey"], [("k", "sum")])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "orderkey": b["o_orderkey"].astype(np.int64),
                "c": _cents_col(b["o_totalprice"]),
            }
        ),
        batch_format="pandas",
    )
    joined = bucketed_join(per_order, orders, on=["orderkey"], how="inner")

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b["k_sum"].astype(np.int64).to_numpy()
        c = b["c"].astype(np.int64).to_numpy()
        cc = sum(int(x) * int(x) for x in c)
        kc = sum(int(a) * int(x) for a, x in zip(k, c))
        return pd.DataFrame(
            {
                "key": np.zeros(1, dtype=np.int64),
                "n": np.array([len(b)], dtype=np.int64),
                "sk": np.array([int(k.sum())], dtype=np.int64),
                "sc": np.array([int(c.sum())], dtype=np.int64),
                "skk": np.array([int((k * k).sum())], dtype=np.int64),
                "cc_hi": np.array([cc >> 32], dtype=np.int64),
                "cc_lo": np.array([cc & ((1 << 32) - 1)], dtype=np.int64),
                "kc_hi": np.array([kc >> 32], dtype=np.int64),
                "kc_lo": np.array([kc & ((1 << 32) - 1)], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        joined.map_batches(partial, batch_format="pandas"),
        ["key"],
        [
            ("n", "sum"), ("sk", "sum"), ("sc", "sum"), ("skk", "sum"),
            ("cc_hi", "sum"), ("cc_lo", "sum"), ("kc_hi", "sum"), ("kc_lo", "sum"),
        ],
    ).to_pandas().iloc[0]
    n = int(agg["n_sum"])
    sk = int(agg["sk_sum"])
    sc = int(agg["sc_sum"])
    skk = int(agg["skk_sum"])
    scc = (int(agg["cc_hi_sum"]) << 32) + int(agg["cc_lo_sum"])
    skc = (int(agg["kc_hi_sum"]) << 32) + int(agg["kc_lo_sum"])
    num = float(n) * float(skc) - float(sk) * float(sc)
    dx = float(n) * float(skk) - float(sk) * float(sk)
    dy = float(n) * float(scc) - float(sc) * float(sc)
    r = num / (math.sqrt(dx) * math.sqrt(dy))
    return pd.DataFrame(
        {
            "n_orders": np.array([n], dtype=np.int64),
            "corr": [float(_r6away(r))],
        }
    )


ORACLES53["order_size_value_corr"] = """
WITH lc AS (
  SELECT l_orderkey, COUNT(*) AS k FROM lineitem GROUP BY 1
),
j AS (
  SELECT lc.k, CAST(ROUND(o.o_totalprice * 100) AS BIGINT) AS c
  FROM lc JOIN orders o ON o.o_orderkey = lc.l_orderkey
),
a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(k) AS BIGINT) AS sk,
         CAST(SUM(c) AS BIGINT) AS sc,
         CAST(SUM(k * k) AS BIGINT) AS skk,
         SUM(c::HUGEINT * c::HUGEINT) AS scc,
         SUM(k::HUGEINT * c::HUGEINT) AS skc
  FROM j
)
SELECT CAST(n AS BIGINT) AS n_orders,
       ROUND((CAST(n AS DOUBLE) * CAST(skc AS DOUBLE)
              - CAST(sk AS DOUBLE) * CAST(sc AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
                     - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
                       - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))), 6) AS corr
FROM a
"""


QUERIES53["token_freq_spectrum"] = q_token_freq_spectrum
QUERIES53["order_size_value_corr"] = q_order_size_value_corr
