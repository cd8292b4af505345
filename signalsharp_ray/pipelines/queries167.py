"""Round-5 batch 167: overdispersion scaling and hash-infrastructure
audit — the Fano factor (variance-to-mean of window counts) across
window sizes 1h/6h/24h with the moment estimate of the Hawkes
branching ratio (for a self-exciting stream the large-window Fano
approaches 1/(1-n)^2, so n = 1 - 1/sqrt(F); for Poisson F = 1, n = 0),
and a birthday-bound hash-collision audit over 16-bit md5 prefixes of
document texts (is the content hash actually uniform on THIS corpus —
the sanity check dedup bucketing silently relies on).

House parity strategy: window counts and collision pair counts are
exact integers; Fano/branching and the expected-collision formula are
single shared float expressions (libm sqrt); md5 is bitwise identical
across engines by definition.

Scale contracts: window counts ride keyed exchanges on (type, window);
the collision audit groups by 16-bit bucket — a bounded exchange."""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd

from .queries2 import _documents, _events, _r6

QUERIES167: dict = {}
ORACLES167: dict = {}

_FANO_WINDOWS_H = (1, 6, 24)


def q_fano_branching(sf_dir: str):
    """Per (event_type, window of 1/6/24 hours): Fano factor of the
    observed window counts and the Hawkes moment branching estimate
    n = 1 - 1/sqrt(F) (clamped at 0 for underdispersed streams). A
    rising Fano curve = clustered arrivals; flat at 1 = Poisson.
    Output (event_type, window_h, n_windows, fano, branching)."""
    from ..common.raytools import hash_bucket_aggregate

    ev = _events(sf_dir, ["ts", "event_type"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        hrs = batch["ts"].to_numpy("datetime64[us]").view(np.int64) // (
            3_600_000_000
        )
        out = []
        for w in _FANO_WINDOWS_H:
            out.append(
                pd.DataFrame(
                    {
                        "event_type": batch["event_type"],
                        "window_h": np.full(len(batch), w, dtype=np.int64),
                        "win": (hrs // w).astype(np.int64),
                    }
                )
            )
        return pd.concat(out, ignore_index=True)

    counts = (
        hash_bucket_aggregate(
            ev.map_batches(partial, batch_format="pandas"),
            ["event_type", "window_h", "win"],
            [],
            count_alias="n",
        )
        .to_pandas()
    )
    rows = []
    for (et, w), g in counts.groupby(["event_type", "window_h"], sort=True):
        v = g["n"].to_numpy(np.int64)
        k = len(v)
        if k < 2:
            continue
        sv = int(v.sum())
        svv = int((v * v).sum())
        mean = float(sv) / float(k)
        var = (float(svv) - float(sv) * float(sv) / float(k)) / float(k)
        if mean <= 0.0:
            continue
        fano = var / mean
        br = 1.0 - 1.0 / math.sqrt(fano) if fano > 1.0 else 0.0
        rows.append(
            (
                et,
                np.int64(w),
                np.int64(k),
                float(_r6(np.array([fano]))[0]),
                float(_r6(np.array([br]))[0]),
            )
        )
    return pd.DataFrame(
        rows,
        columns=["event_type", "window_h", "n_windows", "fano", "branching"],
    )


QUERIES167["fano_branching"] = q_fano_branching
ORACLES167["fano_branching"] = """
WITH c AS (
  SELECT event_type, w.w AS window_h,
         (epoch_us(ts) // 3600000000) // w.w AS win,
         COUNT(*) AS n
  FROM events, (SELECT UNNEST([1, 6, 24]) AS w) w
  GROUP BY 1, 2, 3
),
a AS (
  SELECT event_type, window_h, COUNT(*) AS k,
         SUM(n) AS sv, SUM(n * n) AS svv
  FROM c GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
f AS (
  SELECT event_type, window_h, k,
         CAST(sv AS DOUBLE) / CAST(k AS DOUBLE) AS mean,
         (CAST(svv AS DOUBLE)
          - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) / CAST(k AS DOUBLE))
           / CAST(k AS DOUBLE) AS var
  FROM a
)
SELECT event_type, CAST(window_h AS BIGINT) AS window_h,
       CAST(k AS BIGINT) AS n_windows,
       ROUND(var / mean, 6) AS fano,
       ROUND(CASE WHEN var / mean > 1.0
                  THEN 1.0 - 1.0 / sqrt(var / mean)
                  ELSE 0.0 END, 6) AS branching
FROM f WHERE mean > 0
"""


def q_hash_collision_audit(sf_dir: str):
    """Birthday-bound audit of the content hash dedup relies on:
    16-bit md5-prefix buckets of document text — observed colliding
    pairs sum C(c,2) vs the uniform expectation n(n-1)/2/65536, and
    their ratio (~1 = healthy hash, >> 1 = skewed content or broken
    hashing; duplicate texts legitimately inflate it). Output one row
    (n_docs, n_buckets_used, observed_pairs, expected_pairs, ratio)."""
    from ..common.raytools import hash_bucket_aggregate

    docs = _documents(sf_dir, ["text"])

    def partial(batch: pd.DataFrame) -> pd.DataFrame:
        h = np.fromiter(
            (
                int(hashlib.md5((t or "").encode()).hexdigest()[:4], 16)
                for t in batch["text"]
            ),
            dtype=np.int64,
            count=len(batch),
        )
        return pd.DataFrame({"bucket": h})

    agg = (
        hash_bucket_aggregate(
            docs.map_batches(partial, batch_format="pandas"),
            ["bucket"],
            [],
            count_alias="c",
        )
        .to_pandas()
    )
    c = agg["c"].to_numpy(np.int64)
    n = int(c.sum())
    observed = int((c * (c - 1) // 2).sum())
    expected = float(n) * float(n - 1) / 2.0 / 65536.0
    ratio = float(observed) / expected if expected > 0 else 0.0
    return pd.DataFrame(
        {
            "n_docs": np.array([n], dtype=np.int64),
            "n_buckets_used": np.array([len(c)], dtype=np.int64),
            "observed_pairs": np.array([observed], dtype=np.int64),
            "expected_pairs": _r6(np.array([expected])),
            "ratio": _r6(np.array([ratio])),
        }
    )


QUERIES167["hash_collision_audit"] = q_hash_collision_audit
ORACLES167["hash_collision_audit"] = """
WITH h AS (
  SELECT CAST(('0x' || LEFT(md5(COALESCE(text, '')), 4)) AS BIGINT)
           AS bucket
  FROM documents
),
c AS (SELECT bucket, COUNT(*) AS c FROM h GROUP BY 1),
a AS (
  SELECT SUM(c) AS n, COUNT(*) AS used,
         SUM(c * (c - 1) // 2) AS observed
  FROM c
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(used AS BIGINT) AS n_buckets_used,
       CAST(observed AS BIGINT) AS observed_pairs,
       ROUND(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) / 2.0 / 65536.0, 6)
         AS expected_pairs,
       ROUND(CASE WHEN n > 1
                  THEN CAST(observed AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                          / 2.0 / 65536.0)
                  ELSE 0.0 END, 6) AS ratio
FROM a
"""
