"""Round-3 batch 54: micro-diversity and coverage diagnostics — the
mean per-document type-token ratio per source (lexical diversity at
document granularity; vocabulary-level TTR hides template spam), and
hourly coverage per event type (share of the dense grid's hours with
any data — the instrumentation-health gauge feeding gap-fill
decisions).

House parity: per-doc TTRs are exact-integer ratios folded over
ascending doc_id (list_sum contract); coverage is a pure integer
present-hours count over the per-type dense grid bounds with one
division.

Scale contracts: per-doc token sets are computed inside batch kernels;
the per-source fold is over a doc-bounded table; coverage tables are
catalog-bounded.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries6 import HOUR_US, _hourly_counts
from .queries14 import _fold
from .queries16 import _TOKEN_RE

QUERIES52: dict = {}
ORACLES52: dict = {}


# ---------------------------------------------------------------------------
# Mean per-document type-token ratio
# ---------------------------------------------------------------------------


def q_doc_ttr_mean(sf_dir: str):
    """Per source: the mean over documents of (distinct tokens /
    total tokens) — document-level lexical diversity (a source full of
    copy-paste templates scores low even when its pooled vocabulary
    looks rich). Per-doc ratios are exact integer divisions folded
    over ascending doc_id; tokenless docs are excluded identically."""
    docs = _documents(sf_dir, ["doc_id", "source", "text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        ids, srcs, ttrs = [], [], []
        for did, src, text in zip(batch["doc_id"], batch["source"], batch["text"]):
            toks = _TOKEN_RE.findall((text or "").lower())
            if not toks:
                continue
            ids.append(int(did))
            srcs.append(src)
            ttrs.append(float(len(set(toks))) / float(len(toks)))
        return pd.DataFrame(
            {
                "doc_id": np.array(ids, dtype=np.int64),
                "source": srcs,
                "ttr": ttrs,
            }
        )

    per_doc = (
        docs.map_batches(partial, batch_format="pandas")
        .to_pandas()
        .sort_values("doc_id")
    )
    rows = []
    for src, g in per_doc.groupby("source", sort=True):
        g = g.sort_values("doc_id")
        n = len(g)
        mean_ttr = _fold([float(x) for x in g["ttr"]]) / float(n)
        rows.append((src, n, float(_r6away(mean_ttr))))
    return pd.DataFrame(rows, columns=["source", "n_docs", "mean_ttr"]).astype(
        {"n_docs": np.int64}
    )


ORACLES52["doc_ttr_mean"] = """
WITH t AS (
  SELECT doc_id, source,
         UNNEST(regexp_extract_all(lower(COALESCE(text, '')),
                                   '[\\p{L}\\p{N}_]+')) AS tok
  FROM documents
),
d AS (
  SELECT doc_id, source,
         CAST(COUNT(DISTINCT tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS ttr
  FROM t GROUP BY 1, 2
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(list_sum(list(ttr ORDER BY doc_id))
             / CAST(COUNT(*) AS DOUBLE), 6) AS mean_ttr
FROM d GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Hourly coverage per type
# ---------------------------------------------------------------------------


def q_hour_coverage(sf_dir: str):
    """Per event type: hours with any data over its own dense
    [min, max] hourly span, and the coverage share — the
    instrumentation-health gauge behind gap-fill policy (max_drought
    shows the worst hole; this shows the overall density). Pure
    integer counts; one division."""
    agg = _hourly_counts(sf_dir)
    rows = []
    for t, g in agg.groupby("event_type", sort=True):
        hours = g["hour_us"].to_numpy(np.int64)
        lo = int(hours.min())
        hi = int(hours.max())
        span = (hi - lo) // HOUR_US + 1
        present = int(hours.size)
        rows.append(
            (
                t,
                span,
                present,
                float(_r6away(float(present) / float(span))),
            )
        )
    return pd.DataFrame(
        rows, columns=["event_type", "span_hours", "present_hours", "coverage"]
    ).astype({"span_hours": np.int64, "present_hours": np.int64})


ORACLES52["hour_coverage"] = """
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type,
       CAST((epoch_us(MAX(bh)) - epoch_us(MIN(bh))) // 3600000000 + 1
         AS BIGINT) AS span_hours,
       CAST(COUNT(*) AS BIGINT) AS present_hours,
       ROUND(CAST(COUNT(*) AS DOUBLE)
             / CAST((epoch_us(MAX(bh)) - epoch_us(MIN(bh))) // 3600000000 + 1
                    AS DOUBLE), 6) AS coverage
FROM h GROUP BY 1
"""


QUERIES52["doc_ttr_mean"] = q_doc_ttr_mean
QUERIES52["hour_coverage"] = q_hour_coverage
