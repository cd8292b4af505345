"""Round-3 batch 50: elasticity and extremal-day diagnostics — the
quantity vs unit-price correlation over lineitems (the crude demand
elasticity screen: negative means bigger orders buy cheaper units),
the peak day (argmax daily total with its share of all traffic and
z-score against the daily distribution), and the question-doc share
per source (documents ending in '?' — forum/Q&A content shows up
immediately).

House parity: the Pearson uses exact integer quantity and
half-away-rounded unit-price cents power sums (HUGEINT); the peak day
is an integer argmax with its z one transcribed expression over exact
sums; question endings use the SAME trailing-'?' test through Python
rstrip/endswith and RE2 '\\?\\s*$'.

Scale contracts: all reductions are single exchanges; day tables are
calendar-bounded.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _events, _r6away
from .queries16 import _read
from .queries42 import _unit_cents

QUERIES48: dict = {}
ORACLES48: dict = {}

DAY_US = 86_400_000_000


# ---------------------------------------------------------------------------
# Quantity vs unit-price correlation
# ---------------------------------------------------------------------------


def q_qty_price_corr(sf_dir: str):
    """Pearson correlation between lineitem quantity and unit price
    (half-away cents of extendedprice/quantity) — the bulk-discount
    elasticity screen. Exact integer power sums (Python ints /
    HUGEINTs); one transcribed expression."""
    li = _read(
        sf_dir, "lineitem", ["l_quantity", "l_extendedprice"]
    ).map_batches(
        lambda b: pd.DataFrame(
            {
                "q": np.rint(b["l_quantity"].to_numpy(np.float64)).astype(np.int64),
                "up": _unit_cents(
                    b["l_extendedprice"].to_numpy(np.float64),
                    b["l_quantity"].to_numpy(np.float64),
                ),
            }
        )
        .assign(
            n=lambda d: np.ones(len(d), dtype=np.int64),
            qq=lambda d: d["q"] * d["q"],
        ),
        batch_format="pandas",
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        q = b["q"].to_numpy(np.int64)
        up = b["up"].to_numpy(np.int64)
        # unit-price squares can overflow at scale: 2^32-base limbs
        uu = sum(int(x) * int(x) for x in up)
        qu = sum(int(a) * int(c) for a, c in zip(q, up))
        return pd.DataFrame(
            {
                "key": np.zeros(1, dtype=np.int64),
                "n": np.array([len(b)], dtype=np.int64),
                "sq": np.array([int(q.sum())], dtype=np.int64),
                "su": np.array([int(up.sum())], dtype=np.int64),
                "sqq": np.array([int((q * q).sum())], dtype=np.int64),
                "uu_hi": np.array([uu >> 32], dtype=np.int64),
                "uu_lo": np.array([uu & ((1 << 32) - 1)], dtype=np.int64),
                "qu_hi": np.array([qu >> 32], dtype=np.int64),
                "qu_lo": np.array([qu & ((1 << 32) - 1)], dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        li.map_batches(partial, batch_format="pandas"),
        ["key"],
        [
            ("n", "sum"), ("sq", "sum"), ("su", "sum"), ("sqq", "sum"),
            ("uu_hi", "sum"), ("uu_lo", "sum"), ("qu_hi", "sum"), ("qu_lo", "sum"),
        ],
    ).to_pandas().iloc[0]
    n = int(agg["n_sum"])
    sq = int(agg["sq_sum"])
    su = int(agg["su_sum"])
    sqq = int(agg["sqq_sum"])
    suu = (int(agg["uu_hi_sum"]) << 32) + int(agg["uu_lo_sum"])
    squ = (int(agg["qu_hi_sum"]) << 32) + int(agg["qu_lo_sum"])
    num = float(n) * float(squ) - float(sq) * float(su)
    dx = float(n) * float(sqq) - float(sq) * float(sq)
    dy = float(n) * float(suu) - float(su) * float(su)
    r = num / (math.sqrt(dx) * math.sqrt(dy))
    return pd.DataFrame(
        {
            "n_items": np.array([n], dtype=np.int64),
            "corr": [float(_r6away(r))],
        }
    )


ORACLES48["qty_price_corr"] = """
WITH l AS (
  SELECT CAST(ROUND(l_quantity) AS BIGINT) AS q,
         CAST(ROUND(l_extendedprice / l_quantity * 100.0) AS BIGINT) AS up
  FROM lineitem
),
a AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(q) AS BIGINT) AS sq,
         CAST(SUM(up) AS BIGINT) AS su,
         CAST(SUM(q * q) AS BIGINT) AS sqq,
         SUM(up::HUGEINT * up::HUGEINT) AS suu,
         SUM(q::HUGEINT * up::HUGEINT) AS squ
  FROM l
)
SELECT CAST(n AS BIGINT) AS n_items,
       ROUND((CAST(n AS DOUBLE) * CAST(squ AS DOUBLE)
              - CAST(sq AS DOUBLE) * CAST(su AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sqq AS DOUBLE)
                     - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
                       - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))), 6) AS corr
FROM a
"""


# ---------------------------------------------------------------------------
# Peak day
# ---------------------------------------------------------------------------


def q_peak_day(sf_dir: str):
    """The single busiest calendar day: its event count, share of all
    events, and z-score against the daily distribution (exact integer
    sums; (count DESC, day ASC) ties) — how extreme was the worst
    day."""
    ev = _events(sf_dir, ["ts"]).map_batches(
        lambda b: pd.DataFrame(
            {
                "day_us": (
                    b["ts"].to_numpy("datetime64[us]").view(np.int64) // DAY_US
                )
                * DAY_US,
            }
        )
        .groupby("day_us", sort=False)
        .size()
        .reset_index(name="n")
        .astype({"n": np.int64}),
        batch_format="pandas",
    )
    agg = (
        hash_bucket_aggregate(ev, ["day_us"], [("n", "sum")])
        .to_pandas()
        .sort_values(["n_sum", "day_us"], ascending=[False, True])
    )
    v = agg["n_sum"].to_numpy(np.int64)
    n = int(v.size)
    s = int(v.sum())
    ss = sum(int(a) * int(a) for a in v)
    nf = float(n)
    mu = float(s) / nf
    var = float(ss) / nf - mu * mu
    peak = int(agg["n_sum"].iloc[0])
    z = (float(peak) - mu) / math.sqrt(var)
    return pd.DataFrame(
        {
            "peak_day_us": np.array([int(agg["day_us"].iloc[0])], dtype=np.int64),
            "n_events": np.array([peak], dtype=np.int64),
            "share": [float(_r6away(float(peak) / float(s)))],
            "zscore": [float(_r6away(z))],
        }
    )


ORACLES48["peak_day"] = """
WITH d AS (
  SELECT date_trunc('day', ts) AS day, COUNT(*) AS n
  FROM events GROUP BY 1
),
st AS (
  SELECT COUNT(*) AS nd,
         CAST(SUM(n) AS BIGINT) AS s,
         CAST(SUM(n::HUGEINT * n::HUGEINT) AS BIGINT) AS ss
  FROM d
),
m AS (
  SELECT nd, s, ss,
         CAST(s AS DOUBLE) / CAST(nd AS DOUBLE) AS mu,
         CAST(ss AS DOUBLE) / CAST(nd AS DOUBLE)
           - (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE))
             * (CAST(s AS DOUBLE) / CAST(nd AS DOUBLE)) AS var
  FROM st
),
p AS (
  SELECT day, n, ROW_NUMBER() OVER (ORDER BY n DESC, day ASC) AS rn
  FROM d
)
SELECT CAST(epoch_us(p.day) AS BIGINT) AS peak_day_us,
       CAST(p.n AS BIGINT) AS n_events,
       ROUND(CAST(p.n AS DOUBLE) / CAST(m.s AS DOUBLE), 6) AS share,
       ROUND((CAST(p.n AS DOUBLE) - m.mu) / sqrt(m.var), 6) AS zscore
FROM p CROSS JOIN m WHERE p.rn = 1
"""


# ---------------------------------------------------------------------------
# Question-doc share per source
# ---------------------------------------------------------------------------


def q_question_doc_share(sf_dir: str):
    """Per source: share of documents whose text ends with '?'
    (trailing whitespace ignored) — Q&A / forum content stands out.
    The SAME trailing test through Python rstrip/endswith and RE2;
    exact integer counts."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        srcs, tot, qs = [], [], []
        for src, text in zip(batch["source"], batch["text"]):
            srcs.append(src)
            tot.append(1)
            qs.append(1 if (text or "").rstrip().endswith("?") else 0)
        return pd.DataFrame(
            {
                "source": srcs,
                "t": np.array(tot, dtype=np.int64),
                "k": np.array(qs, dtype=np.int64),
            }
        )

    agg = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source"],
        [("t", "sum"), ("k", "sum")],
    ).to_pandas()
    share = [
        float(_r6away(float(int(k)) / float(int(t))))
        for k, t in zip(agg["k_sum"], agg["t_sum"])
    ]
    return (
        pd.DataFrame(
            {
                "source": agg["source"],
                "n_docs": agg["t_sum"].astype(np.int64),
                "n_question": agg["k_sum"].astype(np.int64),
                "question_share": share,
            }
        )
        .sort_values("source")
        .reset_index(drop=True)
    )


ORACLES48["question_doc_share"] = """
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(*) FILTER (
         WHERE regexp_matches(COALESCE(text, ''), '\\?\\s*$')) AS BIGINT)
         AS n_question,
       ROUND(CAST(COUNT(*) FILTER (
               WHERE regexp_matches(COALESCE(text, ''), '\\?\\s*$')) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE), 6) AS question_share
FROM documents GROUP BY 1
"""


QUERIES48["qty_price_corr"] = q_qty_price_corr
QUERIES48["peak_day"] = q_peak_day
QUERIES48["question_doc_share"] = q_question_doc_share
