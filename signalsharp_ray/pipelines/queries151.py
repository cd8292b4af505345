"""Round-5 batch 151: Bayesian online changepoint detection (BOCD).

BOCD is the one algorithm on the reference's own roadmap
(/root/reference/docs/docs/future-plans.md:18 "Bayesian Online
Changepoint Detection") that the reference has not implemented; adding
it completes the changepoint family next to PELT
(/root/reference/SignalSharp/Detection/PELT/PELTAlgorithm.cs) and CUSUM
(/root/reference/SignalSharp/Detection/CUSUM/CUSUMAlgorithm.cs).
Algorithm: Adams & MacKay 2007 (arXiv:0710.3742, public) run-length
posterior recursion, constant hazard, Normal-Gamma conjugate model.

Verification pattern mirrors binseg_step_detection /
pelt_step_detection (queries6.py:445): a deterministic SQUARE-WAVE
series (level 100*((k//step)%2) on hour-bucket index k) is built per
event_type from the distributed 1h rollup; the run-length posterior of
a noiseless square wave is sharply peaked, so the MAP-drop detector
must recover exactly the level flips — multiples of `step` — which the
oracle derives in closed form. (A monotone staircase is deliberately
NOT used: under unknown-variance BOCD the first point of each new
level inflates the variance posterior by (level - mu0)^2, so at high
absolute levels a fixed 100-unit step stops being surprising; the
bounded square wave keeps the posterior geometry identical at every
flip, which is what makes the recovery exact at any series length —
tested to 8761 hourly buckets, the sf0.1 horizon.)

Scale contracts: the hour series per event_type is bounded by the
retention window (8.8k buckets/year), built by the same streaming
rollup exchange every other per-series kernel rides; BOCD itself is
O(n * active run lengths) inside the bucket — no driver state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries2 import _documents, _events

QUERIES151: dict = {}
ORACLES151: dict = {}


def q_bocd_changepoints(sf_dir: str, step: int = 40):
    """Per event_type: BOCD-detected changepoint indices of the
    square-wave series over that type's hourly buckets. Closed-form
    expectation: every multiple of `step` below the bucket count."""
    from ..kernels.bocd import BOCDOptions, bocd_changepoints
    from ..stages.rollup import rollup_tier

    t1h = rollup_tier(
        _events(sf_dir, ["ts", "event_type", "value"]), "1h",
        key_cols=["event_type"],
    )
    opts = BOCDOptions(hazard=1.0 / step, beta0=1.0)

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("bucket_ts")
        idx = np.arange(len(df), dtype=np.int64)
        vals = 100.0 * ((idx // step) % 2).astype(np.float64)
        cps = bocd_changepoints(vals, opts)
        return pd.DataFrame(
            {
                "event_type": np.repeat(df["event_type"].iloc[0], len(cps)),
                "changepoint_index": cps,
            }
        )

    return t1h.groupby("event_type").map_groups(fn, batch_format="pandas")


QUERIES151["bocd_changepoints"] = q_bocd_changepoints
ORACLES151["bocd_changepoints"] = """
WITH b AS (
  SELECT event_type, COUNT(DISTINCT date_trunc('hour', ts)) AS n
  FROM events GROUP BY 1
)
SELECT event_type, CAST(g AS BIGINT) AS changepoint_index
FROM b, UNNEST(generate_series(40, CAST(n AS BIGINT) - 1, 40)) AS t(g)
"""


# ---------------------------------------------------------------------------
# Incremental cross-snapshot dedup (round-4 VERDICT item 8)
# ---------------------------------------------------------------------------


def q_dedup_incremental(sf_dir: str):
    """Incremental exact dedup: the corpus arrives as TWO snapshots (a
    deterministic doc_id % 3 split — the 'existing corpus' then the 'new
    crawl increment'); each is applied to a persisted hive-partitioned
    content-hash index (stages/incremental_dedup.py) that merges only the
    touched bucket files and never re-reads the historical corpus. Because
    min(doc_id)/count merge associatively, the final index equals the
    batch exact_dedup of the UNIONED corpus — which is the oracle."""
    import os
    import uuid

    from ..stages.incremental_dedup import DedupIndexStore

    docs = _documents(sf_dir, ["doc_id", "text"])

    def keep(is_increment: bool):
        def fn(batch: pd.DataFrame) -> pd.DataFrame:
            mask = (batch["doc_id"].to_numpy(np.int64) % 3 == 2) == is_increment
            return batch[mask]

        return fn

    root = (
        os.environ.get("SIGNALSHARP_HANDOFF_ROOT", "/tmp/signalsharp_ray/handoff")
        + f"/dedup-index-{os.getpid()}-{uuid.uuid4().hex[:8]}"
    )
    store = DedupIndexStore(root, n_buckets=64)
    store.apply(docs.map_batches(keep(False), batch_format="pandas"), fingerprint="base")
    store.apply(docs.map_batches(keep(True), batch_format="pandas"), fingerprint="increment")
    return store.read_dataset()


QUERIES151["dedup_incremental"] = q_dedup_incremental
ORACLES151["dedup_incremental"] = """
SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies FROM documents GROUP BY text
"""
