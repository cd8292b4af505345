"""Round-4 batch 143: forecast-interval calibration and cross-source
contamination — the empirical coverage of a trailing-24h normal
prediction interval over the next hour's load (are the error bars the
dashboards draw actually 95% intervals), and the cross-source duplicate
matrix (how many 8-token prefix fingerprints every PAIR of sources
shares — the boilerplate-contamination edge list between feeds).

House parity: window sums/squares are exact integers; the interval
predicate |x*24 - s| <= z*sqrt(24*(24q - s^2)) compares the SAME double
on both engines (both sides of the inequality are single transcribed
expressions over exact ints); fingerprint pair counts are exact
integers through fingerprint-complete buckets.

Scale contracts: rolling sums fold over the retention-bounded dense
grid; fingerprints cross ONE content-hash exchange (the exact_dedup
contract) and only (source_a, source_b, n) rows leave it."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from ..common.raytools import hash_bucket_aggregate
from .queries2 import _documents, _r6away
from .queries6 import _hourly_counts
from .queries8 import _dense_by_type

QUERIES143: dict = {}
ORACLES143: dict = {}

PI_Z = 1.959964
PI_W = 24


def q_interval_coverage_24h(sf_dir: str):
    """Per event_type: of all dense-grid hours with a full 24-hour
    lookback, how many fell inside mean +- 1.959964 * sd of that
    trailing window (population sd over the 24 lagged hours) — the
    empirical calibration of the naive normal interval (95% nominal;
    big gaps mean the process is not locally normal). The membership
    predicate |24x - s| <= z * sqrt(24q - s^2) evaluates over exact
    integer window sums; windows with zero variance count as covered
    iff x equals the window mean exactly (24x == s)."""
    types, grid, mat = _dense_by_type(_hourly_counts(sf_dir))
    n = int(grid.size)
    if n <= PI_W:
        return pd.DataFrame(
            {
                "event_type": pd.Series([], dtype=object),
                "n_checked": pd.Series([], dtype=np.int64),
                "n_covered": pd.Series([], dtype=np.int64),
                "coverage": pd.Series([], dtype=np.float64),
            }
        )
    rows = []
    for ti, t in enumerate(types):
        v = mat[ti]
        cs = np.concatenate([[0], np.cumsum(v, dtype=np.int64)])
        cq = np.concatenate([[0], np.cumsum(v * v, dtype=np.int64)])
        checked = 0
        covered = 0
        for i in range(PI_W, n):
            s = int(cs[i] - cs[i - PI_W])
            q = int(cq[i] - cq[i - PI_W])
            x = int(v[i])
            checked += 1
            lhs = abs(PI_W * x - s)
            var_num = PI_W * q - s * s  # W^2 * var, exact int
            if var_num <= 0:
                if PI_W * x == s:
                    covered += 1
                continue
            if float(lhs) <= PI_Z * math.sqrt(float(var_num)):
                covered += 1
        rows.append(
            (
                t,
                checked,
                covered,
                float(_r6away(float(covered) / float(checked))),
            )
        )
    return pd.DataFrame(
        rows, columns=["event_type", "n_checked", "n_covered", "coverage"]
    ).astype({"n_checked": np.int64, "n_covered": np.int64})


ORACLES143["interval_coverage_24h"] = f"""
WITH h AS (
  SELECT event_type, date_trunc('hour', ts) AS bh, COUNT(*) AS n
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT MIN(bh) AS lo, MAX(bh) AS hi FROM h),
grid AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bh FROM bounds
),
types AS (SELECT DISTINCT event_type FROM h),
dense AS (
  SELECT t.event_type, g.bh,
         CAST(ROW_NUMBER() OVER (PARTITION BY t.event_type ORDER BY g.bh) - 1
              AS BIGINT) AS idx,
         CAST(COALESCE(h.n, 0) AS BIGINT) AS x
  FROM types t CROSS JOIN grid g
  LEFT JOIN h ON h.event_type = t.event_type AND h.bh = g.bh
),
w AS (
  SELECT event_type, idx, x,
         SUM(x) OVER (PARTITION BY event_type ORDER BY idx
                      ROWS BETWEEN {PI_W} PRECEDING AND 1 PRECEDING) AS s,
         SUM(x * x) OVER (PARTITION BY event_type ORDER BY idx
                          ROWS BETWEEN {PI_W} PRECEDING AND 1 PRECEDING)
           AS q,
         COUNT(*) OVER (PARTITION BY event_type ORDER BY idx
                        ROWS BETWEEN {PI_W} PRECEDING AND 1 PRECEDING) AS c
  FROM dense
),
f AS (
  SELECT event_type,
         COUNT(*) AS n_checked,
         COUNT(*) FILTER (WHERE
           CASE WHEN {PI_W} * q - s * s <= 0 THEN {PI_W} * x = s
                ELSE CAST(abs({PI_W} * x - s) AS DOUBLE)
                     <= CAST({PI_Z} AS DOUBLE)
                        * sqrt(CAST({PI_W} * q - s * s AS DOUBLE))
           END) AS n_covered
  FROM w WHERE c = {PI_W}
  GROUP BY 1
)
SELECT event_type, CAST(n_checked AS BIGINT) AS n_checked,
       CAST(n_covered AS BIGINT) AS n_covered,
       ROUND(CAST(n_covered AS DOUBLE) / CAST(n_checked AS DOUBLE), 6)
         AS coverage
FROM f
"""


# ---------------------------------------------------------------------------
# Cross-source duplicate matrix
# ---------------------------------------------------------------------------


def q_cross_source_dup_matrix(sf_dir: str):
    """Per source pair (a < b): how many DISTINCT 8-token PREFIX
    fingerprints (md5 of the first 8 whitespace tokens) occur in BOTH
    sources — shared boilerplate openings between feeds, the
    contamination edge list (exact whole-content duplicates never cross
    sources in this corpus, so the prefix level is where cross-feed
    sharing lives — prefix_dup_share measures it within a source).
    Fingerprints reduce through one hash exchange (32-hex strings cross
    the wire, never text); pairs fold inside fingerprint-complete
    buckets."""

    def fps(batch: pd.DataFrame) -> pd.DataFrame:
        fp = [
            hashlib.md5(" ".join(t.split()[:8]).encode()).hexdigest()
            for t in batch["text"].fillna("")
        ]
        return pd.DataFrame(
            {"fp": fp, "source": batch["source"], "n": 1}
        ).drop_duplicates(["fp", "source"])

    pairs_ds = hash_bucket_aggregate(
        _documents(sf_dir, ["source", "text"]).map_batches(
            fps, batch_format="pandas"
        ),
        ["fp", "source"],
        [("n", "min")],
        bucket_cols=["fp"],
    )

    def pair_counts(batch: pd.DataFrame) -> pd.DataFrame:
        out: dict = {}
        for _, g in batch.groupby("fp", sort=False):
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

    agg = hash_bucket_aggregate(
        pairs_ds.map_batches(
            pair_counts, batch_format="pandas", batch_size=None
        ),
        ["sa", "sb"],
        [("n", "sum")],
    ).to_pandas()
    return pd.DataFrame(
        {
            "source_a": agg["sa"].to_numpy(),
            "source_b": agg["sb"].to_numpy(),
            "n_shared_fingerprints": agg["n_sum"].to_numpy(np.int64),
        }
    )


ORACLES143["cross_source_dup_matrix"] = """
WITH f AS (
  SELECT DISTINCT source,
         md5(array_to_string(
           list_slice(list_filter(regexp_split_to_array(COALESCE(text, ''),
                                                        '\\s+'),
                                  x -> x <> ''), 1, 8), ' ')) AS fp
  FROM documents
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(COUNT(*) AS BIGINT) AS n_shared_fingerprints
FROM f a JOIN f b ON b.fp = a.fp AND b.source > a.source
GROUP BY 1, 2
"""


QUERIES143["interval_coverage_24h"] = q_interval_coverage_24h
QUERIES143["cross_source_dup_matrix"] = q_cross_source_dup_matrix
