"""Round-3 batch 58: composition and whale-concentration diagnostics —
the character-class mix per source (ASCII letter / digit / whitespace /
other shares — the rawest content-type fingerprint), and the top-1%
customer revenue share (whale concentration over the buyer base with
deterministic (revenue DESC, custkey ASC) ranking).

House parity: class counts use the SAME explicit ASCII classes through
Python regex and RE2 (never locale-dependent isalpha); whale selection
is an exact ceil(0.01 n) head of the deterministic ordering with exact
cents sums.

Scale contracts: class counts reduce through one exchange; the whale
fold follows the hill/gini driver contract (per-customer totals are
one exchange; at web scale shard the ranked fold).
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries16 import _cents_col, _read

QUERIES56: dict = {}
ORACLES56: dict = {}

_ALPHA_RE = re.compile(r"[A-Za-z]")
_DIGIT_RE = re.compile(r"[0-9]")
_SPACE_RE = re.compile(r"[ \t\n\r]")


# ---------------------------------------------------------------------------
# Character-class mix per source
# ---------------------------------------------------------------------------


def q_char_class_mix(sf_dir: str):
    """Per source: counts and shares of ASCII letters, digits,
    whitespace and everything else — prose, tables and markup separate
    on this alone. Explicit ASCII classes on both engines; exact
    integer counts; three share divisions."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        srcs, tot, al, dg, sp = [], [], [], [], []
        for src, text in zip(batch["source"], batch["text"]):
            t = text or ""
            srcs.append(src)
            tot.append(len(t))
            al.append(len(_ALPHA_RE.findall(t)))
            dg.append(len(_DIGIT_RE.findall(t)))
            sp.append(len(_SPACE_RE.findall(t)))
        return pd.DataFrame(
            {
                "source": srcs,
                "t": np.array(tot, dtype=np.int64),
                "a": np.array(al, dtype=np.int64),
                "d": np.array(dg, dtype=np.int64),
                "s": np.array(sp, dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"],
        [("t", "sum"), ("a", "sum"), ("d", "sum"), ("s", "sum")],
    ).to_pandas()
    rows = []
    for _, r in agg.iterrows():
        t = int(r["t_sum"])
        a, d, s = int(r["a_sum"]), int(r["d_sum"]), int(r["s_sum"])
        rows.append(
            (
                r["source"],
                t,
                float(_r6away(float(a) / float(t))),
                float(_r6away(float(d) / float(t))),
                float(_r6away(float(s) / float(t))),
                float(_r6away(float(t - a - d - s) / float(t))),
            )
        )
    return (
        pd.DataFrame(
            rows,
            columns=["source", "n_chars", "alpha_share", "digit_share",
                     "space_share", "other_share"],
        )
        .astype({"n_chars": np.int64})
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES56["char_class_mix"] = """
WITH a AS (
  SELECT source,
         CAST(SUM(length(text)) AS BIGINT) AS t,
         CAST(SUM(length(regexp_replace(text, '[^A-Za-z]', '', 'g')))
           AS BIGINT) AS al,
         CAST(SUM(length(regexp_replace(text, '[^0-9]', '', 'g')))
           AS BIGINT) AS dg,
         CAST(SUM(length(regexp_replace(text, '[^ \t\n\r]', '', 'g')))
           AS BIGINT) AS sp
  FROM documents GROUP BY 1
)
SELECT source,
       t AS n_chars,
       ROUND(CAST(al AS DOUBLE) / CAST(t AS DOUBLE), 6) AS alpha_share,
       ROUND(CAST(dg AS DOUBLE) / CAST(t AS DOUBLE), 6) AS digit_share,
       ROUND(CAST(sp AS DOUBLE) / CAST(t AS DOUBLE), 6) AS space_share,
       ROUND(CAST(t - al - dg - sp AS DOUBLE) / CAST(t AS DOUBLE), 6)
         AS other_share
FROM a WHERE t > 0
"""


# ---------------------------------------------------------------------------
# Top-1% customer revenue share
# ---------------------------------------------------------------------------


def q_customer_revenue_topshare(sf_dir: str):
    """What share of all order revenue the top 1% of customers carry
    (k = ceil(0.01 n), (revenue DESC, custkey ASC) ties) — the whale
    dependency number. Per-customer totals are one exchange; the
    ranked head is exact integer sums."""
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "custkey": b["o_custkey"].astype(np.int64),
                "c": _cents_col(b["o_totalprice"]),
            }
        )
        .groupby("custkey", sort=False)["c"]
        .sum()
        .reset_index(),
        batch_format="pandas",
    )
    per_cust = (
        hash_bucket_aggregate(orders, ["custkey"], [("c", "sum")])
        .to_pandas()
        .sort_values(["c_sum", "custkey"], ascending=[False, True])
    )
    n = len(per_cust)
    k = (n + 99) // 100
    top = int(per_cust["c_sum"].head(k).sum())
    total = int(per_cust["c_sum"].sum())
    return pd.DataFrame(
        {
            "n_customers": np.array([n], dtype=np.int64),
            "k_top": np.array([k], dtype=np.int64),
            "top_revenue_c": np.array([top], dtype=np.int64),
            "total_revenue_c": np.array([total], dtype=np.int64),
            "top_share": [float(_r6away(float(top) / float(total)))],
        }
    )


ORACLES56["customer_revenue_topshare"] = """
WITH u AS (
  SELECT o_custkey,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS c
  FROM orders GROUP BY 1
),
r AS (
  SELECT c,
         ROW_NUMBER() OVER (ORDER BY c DESC, o_custkey ASC) AS rn,
         COUNT(*) OVER () AS n
  FROM u
),
a AS (
  SELECT MAX(n) AS n,
         (MAX(n) + 99) // 100 AS k,
         CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(c) FILTER (WHERE rn <= (n + 99) // 100) AS BIGINT) AS top
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS k_top,
       top AS top_revenue_c,
       total AS total_revenue_c,
       ROUND(CAST(top AS DOUBLE) / CAST(total AS DOUBLE), 6) AS top_share
FROM a
"""


QUERIES56["char_class_mix"] = q_char_class_mix
QUERIES56["customer_revenue_topshare"] = q_customer_revenue_topshare
