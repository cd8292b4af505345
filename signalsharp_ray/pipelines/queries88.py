"""Round-3 batch 90: cross-corpus redundancy and effect-size
operators — the sentence-set overlap between sources (shared distinct
normalized sentences and their Jaccard — the sentence-granularity
companion to trigram_set_jaccard), the correlation between supplier
account balance and shipment volume, and the correlation ratio eta^2
of event value explained by hour-of-day (the global effect size over
value_variance_by_hour's per-hour table).

House parity: normalized sentences are the batch-70/87 splitter
output; set sizes and intersections are exact integers; the Pearson
and eta^2 terms are exact integer sums with HUGEINT-safe squares, one
transcribed float expression each (eta^2 folds group terms ascending
hod).

Scale contracts: sentence presence collapses per (source, sentence)
in one exchange; the supplier correlation joins the bounded supplier
dimension; eta^2 is a 24-group partial+final.
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

QUERIES88: dict = {}
ORACLES88: dict = {}

_SENT_RE = re.compile(r"[.!?]+")
HOUR_US = 3_600_000_000


# ---------------------------------------------------------------------------
# Sentence-set overlap between sources
# ---------------------------------------------------------------------------


def q_sentence_overlap_sources(sf_dir: str):
    """Per source pair (a < b): distinct normalized sentences in each,
    shared sentences, and the Jaccard overlap — template reuse across
    sources at sentence granularity."""
    docs = _documents(sf_dir, ["source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        rows: set = set()
        for src, text in zip(batch["source"], batch["text"]):
            for seg in _SENT_RE.split((text or "").lower()):
                toks = _TOKEN_RE.findall(seg)
                if toks:
                    rows.add((src, " ".join(toks)))
        keys = list(rows)
        return pd.DataFrame(
            {
                "source": [k[0] for k in keys],
                "sent": [k[1] for k in keys],
                "one": np.ones(len(keys), dtype=np.int64),
            }
        )

    pres = hash_bucket_aggregate(
        docs.map_batches(partial, batch_format="pandas"),
        ["source", "sent"],
        [("one", "max")],
    ).to_pandas()
    out_empty = pd.DataFrame(
        {"source_a": pd.Series(dtype=object),
         "source_b": pd.Series(dtype=object),
         "n_a": pd.Series(dtype=np.int64),
         "n_b": pd.Series(dtype=np.int64),
         "n_shared": pd.Series(dtype=np.int64),
         "jaccard": pd.Series(dtype=np.float64)}
    )
    if pres.empty:
        return out_empty
    sources = sorted(pres["source"].unique().tolist())
    sets = {s: set(pres.loc[pres["source"] == s, "sent"]) for s in sources}
    rows = []
    for i, a in enumerate(sources):
        for b in sources[i + 1:]:
            inter = len(sets[a] & sets[b])
            union = len(sets[a]) + len(sets[b]) - inter
            if union == 0:
                continue
            rows.append(
                (a, b, len(sets[a]), len(sets[b]), inter,
                 float(_r6away(float(inter) / float(union))))
            )
    if not rows:
        return out_empty
    return pd.DataFrame(
        rows,
        columns=["source_a", "source_b", "n_a", "n_b", "n_shared", "jaccard"],
    ).astype({"n_a": np.int64, "n_b": np.int64, "n_shared": np.int64})


ORACLES88["sentence_overlap_sources"] = """
WITH segs AS (
  SELECT source,
         UNNEST(regexp_split_to_array(lower(COALESCE(text, '')), '[.!?]+'))
           AS seg
  FROM documents
),
norm AS (
  SELECT DISTINCT source,
         array_to_string(regexp_extract_all(seg, '[\\p{L}\\p{N}_]+'), ' ')
           AS sent
  FROM segs
  WHERE len(regexp_extract_all(seg, '[\\p{L}\\p{N}_]+')) > 0
),
sz AS (SELECT source, COUNT(*) AS n FROM norm GROUP BY 1),
pairs AS (
  SELECT a.source AS sa, a.n AS na, b.source AS sb, b.n AS nb
  FROM sz a JOIN sz b ON a.source < b.source
),
inter AS (
  SELECT a.source AS sa, b.source AS sb, COUNT(*) AS ni
  FROM norm a JOIN norm b ON b.sent = a.sent AND a.source < b.source
  GROUP BY 1, 2
)
SELECT p.sa AS source_a, p.sb AS source_b,
       CAST(p.na AS BIGINT) AS n_a, CAST(p.nb AS BIGINT) AS n_b,
       CAST(COALESCE(i.ni, 0) AS BIGINT) AS n_shared,
       ROUND(CAST(COALESCE(i.ni, 0) AS DOUBLE)
             / CAST(p.na + p.nb - COALESCE(i.ni, 0) AS DOUBLE), 6)
         AS jaccard
FROM pairs p
LEFT JOIN inter i ON i.sa = p.sa AND i.sb = p.sb
WHERE p.na + p.nb - COALESCE(i.ni, 0) > 0
"""


# ---------------------------------------------------------------------------
# Supplier balance vs shipment volume correlation
# ---------------------------------------------------------------------------


def q_supplier_balance_volume_corr(sf_dir: str):
    """One global row: Pearson correlation between supplier account
    balance (cents) and shipment count across suppliers (suppliers
    with zero shipments count as volume 0)."""
    # scale shape: shipment counts pre-reduce per suppkey, then the
    # supplier dimension attaches via one co-partitioned bucketed_join
    # (how='right' keeps zero-shipment suppliers); the moment sums reduce
    # per batch — supplier is O(sf) and never touches the driver whole
    from ..common.raytools import bucketed_join

    vol = hash_bucket_aggregate(
        _read(sf_dir, "lineitem", ["l_suppkey"]).map_batches(
            lambda b: pd.DataFrame(
                {
                    "suppkey": b["l_suppkey"].astype(np.int64),
                    "n": np.ones(len(b), dtype=np.int64),
                }
            )
            .groupby("suppkey", sort=False)
            .sum()
            .reset_index(),
            batch_format="pandas",
        ),
        ["suppkey"],
        [("n", "sum")],
    )
    dim = _read(sf_dir, "supplier", ["s_suppkey", "s_acctbal"]).map_batches(
        lambda b: (
            lambda v: pd.DataFrame(
                {
                    "suppkey": b["s_suppkey"].astype(np.int64),
                    "cents": (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(
                        np.int64
                    ),
                }
            )
        )(b["s_acctbal"].to_numpy(np.float64) * 100),
        batch_format="pandas",
    )
    joined = bucketed_join(vol, dim, on=["suppkey"], how="right")

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        # 2^32-limb pattern: cents^2 sums overflow int64 at scale, so each
        # per-batch exact Python-int sum ships as (hi, lo) int64 limbs
        b_ = batch["cents"].astype(np.int64).to_numpy()
        c_ = batch["n_sum"].fillna(0).astype(np.int64).to_numpy()
        sbb = sum(int(x) * int(x) for x in b_)
        scc = sum(int(x) * int(x) for x in c_)
        sbc = sum(int(x) * int(y) for x, y in zip(b_, c_))
        m = (1 << 32) - 1
        return pd.DataFrame(
            {
                "n": np.array([len(b_)], dtype=np.int64),
                "sb": np.array([int(b_.sum())], dtype=np.int64),
                "sc": np.array([int(c_.sum())], dtype=np.int64),
                "sbb_hi": np.array([sbb >> 32], dtype=np.int64),
                "sbb_lo": np.array([sbb & m], dtype=np.int64),
                "scc_hi": np.array([scc >> 32], dtype=np.int64),
                "scc_lo": np.array([scc & m], dtype=np.int64),
                "sbc_hi": np.array([sbc >> 32], dtype=np.int64),
                "sbc_lo": np.array([sbc & m], dtype=np.int64),
            }
        )

    parts = joined.map_batches(partial, batch_format="pandas").to_pandas()
    n = int(parts["n"].sum())
    out_empty = pd.DataFrame(
        {"n_suppliers": pd.Series(dtype=np.int64),
         "r": pd.Series(dtype=np.float64)}
    )
    if n < 2:
        return out_empty

    def _limb(hi_col, lo_col):
        return sum(
            (int(h) << 32) + int(l)
            for h, l in zip(parts[hi_col], parts[lo_col])
        )

    sb, sc = int(parts["sb"].sum()), int(parts["sc"].sum())
    sbb = _limb("sbb_hi", "sbb_lo")
    scc = _limb("scc_hi", "scc_lo")
    sbc = _limb("sbc_hi", "sbc_lo")
    db = float(n * sbb - sb * sb)
    dc = float(n * scc - sc * sc)
    if db <= 0.0 or dc <= 0.0:
        return out_empty
    r = float(n * sbc - sb * sc) / (math.sqrt(db) * math.sqrt(dc))
    return pd.DataFrame(
        {
            "n_suppliers": np.array([n], dtype=np.int64),
            "r": [float(_r6away(r))],
        }
    )


ORACLES88["supplier_balance_volume_corr"] = """
WITH vol AS (
  SELECT l_suppkey AS suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1
),
b AS (
  SELECT CAST(ROUND(s.s_acctbal * 100) AS BIGINT) AS c,
         CAST(COALESCE(vol.n, 0) AS BIGINT) AS v
  FROM supplier s LEFT JOIN vol ON vol.suppkey = s.s_suppkey
),
s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(c) AS BIGINT) AS sb, CAST(SUM(v) AS BIGINT) AS sc,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS sbb,
         CAST(SUM(CAST(v AS HUGEINT) * v) AS HUGEINT) AS scc,
         CAST(SUM(CAST(c AS HUGEINT) * v) AS HUGEINT) AS sbc
  FROM b
)
SELECT CAST(n AS BIGINT) AS n_suppliers,
       ROUND(CAST(CAST(n AS HUGEINT) * sbc - CAST(sb AS HUGEINT) * sc
                  AS DOUBLE)
             / (sqrt(CAST(CAST(n AS HUGEINT) * sbb
                          - CAST(sb AS HUGEINT) * sb AS DOUBLE))
                * sqrt(CAST(CAST(n AS HUGEINT) * scc
                            - CAST(sc AS HUGEINT) * sc AS DOUBLE))), 6) AS r
FROM s
WHERE n >= 2
  AND CAST(n AS HUGEINT) * sbb - CAST(sb AS HUGEINT) * sb > 0
  AND CAST(n AS HUGEINT) * scc - CAST(sc AS HUGEINT) * sc > 0
"""


# ---------------------------------------------------------------------------
# Correlation ratio eta^2 of value by hour-of-day
# ---------------------------------------------------------------------------


def q_value_hod_eta2(sf_dir: str):
    """One global row: eta^2 = SSB/SST of event centivalues grouped by
    hour-of-day — how much of the metric's variance the diurnal cycle
    explains. Group folds ascend hod; HUGEINT-safe squares."""

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        us = batch["ts"].astype("datetime64[us]").astype("int64").to_numpy()
        v = batch["value"].to_numpy(np.float64) * 100
        c = (np.sign(v) * np.floor(np.abs(v) + 0.5)).astype(np.int64)
        return (
            pd.DataFrame(
                {
                    "hod": ((us // HOUR_US) % 24).astype(np.int64),
                    "n": np.ones(len(c), dtype=np.int64),
                    "s": c,
                    "ss": c * c,
                }
            )
            .groupby("hod", sort=False)
            .sum()
            .reset_index()
        )

    agg = (
        hash_bucket_aggregate(
            _events(sf_dir, ["ts", "value"]).map_batches(
                partial, batch_format="pandas"
            ),
            ["hod"],
            [("n", "sum"), ("s", "sum"), ("ss", "sum")],
        )
        .to_pandas()
        .sort_values("hod")
    )
    out_empty = pd.DataFrame(
        {"n_events": pd.Series(dtype=np.int64),
         "n_groups": pd.Series(dtype=np.int64),
         "eta2": pd.Series(dtype=np.float64)}
    )
    if agg.empty:
        return out_empty
    n = int(agg["n_sum"].sum())
    S = int(agg["s_sum"].sum())
    SS = int(agg["ss_sum"].sum())
    corr = float(S) * float(S) / float(n)
    sst = float(SS) - corr
    if sst <= 0.0:
        return out_empty
    ssb = _fold(
        [
            float(int(r["s_sum"])) * float(int(r["s_sum"]))
            / float(int(r["n_sum"]))
            for _, r in agg.iterrows()
        ]
    ) - corr
    return pd.DataFrame(
        {
            "n_events": np.array([n], dtype=np.int64),
            "n_groups": np.array([len(agg)], dtype=np.int64),
            "eta2": [float(_r6away(ssb / sst))],
        }
    )


ORACLES88["value_hod_eta2"] = """
WITH b AS (
  SELECT (epoch_us(ts) // 3600000000) % 24 AS hod,
         CAST(ROUND(value * 100) AS BIGINT) AS c
  FROM events
),
g AS (
  SELECT hod, COUNT(*) AS nh, CAST(SUM(c) AS BIGINT) AS sh,
         CAST(SUM(CAST(c AS HUGEINT) * c) AS HUGEINT) AS ssh
  FROM b GROUP BY 1
),
tot AS (
  SELECT SUM(nh) AS n, CAST(SUM(sh) AS BIGINT) AS s,
         CAST(SUM(ssh) AS HUGEINT) AS ss, COUNT(*) AS k
  FROM g
),
a AS (
  SELECT tot.n, tot.k, tot.s, tot.ss,
         (SELECT list_sum(list(CAST(sh AS DOUBLE) * CAST(sh AS DOUBLE)
                               / CAST(nh AS DOUBLE) ORDER BY hod))
          FROM g) AS fold
  FROM tot
)
SELECT CAST(n AS BIGINT) AS n_events, CAST(k AS BIGINT) AS n_groups,
       ROUND((fold - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(n AS DOUBLE))
             / (CAST(ss AS DOUBLE)
                - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)),
             6) AS eta2
FROM a
WHERE CAST(ss AS DOUBLE)
      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE) > 0
"""


QUERIES88["sentence_overlap_sources"] = q_sentence_overlap_sources
QUERIES88["supplier_balance_volume_corr"] = q_supplier_balance_volume_corr
QUERIES88["value_hod_eta2"] = q_value_hod_eta2
