"""Round-5 batch 153: training-data mixing operators — deterministic
stratified sampling and temperature-scaled source mixing weights.

The two steps between a filtered corpus and a training run: decide how
much of each source to take (mixing weights, the temperature-sampling
rule used by multilingual/multi-corpus LM training), then take a
REPRODUCIBLE sample at those rates (public temperature-sampling
formulation p_i = c_i^alpha / sum_j c_j^alpha, the mC4/XLM-R rule;
hash-gated, not RNG-gated, so the
sample is stable across runs/cluster sizes and joinable against any
later re-run — the property a 100-TB pipeline needs for resumability
and ablation reproducibility).

Scale contracts: sampling is a stateless per-batch hash gate (no
shuffle at all — each batch filters independently); the weights query
moves one count row per source.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from .queries2 import _documents, _r6

QUERIES153: dict = {}
ORACLES153: dict = {}

# the same multiplicative mix the house uses for integer keys elsewhere
_SAMPLE_MOD = np.uint64(1_000_003)


def q_stratified_sample(sf_dir: str):
    """Deterministic per-source stratified sample: keep a doc when
    (doc_id * 1000003) % 100 < rate(source) with per-source rates
    {web:20, wiki:80, code:50, default:10} — a pure hash gate, so the
    sample is reproducible, shuffle-free, and identically computable in
    SQL. Output: the kept (doc_id, source)."""
    rates = {"web": 20, "wiki": 80, "code": 50}
    default_rate = 10

    def fn(batch: pd.DataFrame) -> pd.DataFrame:
        gate = (
            batch["doc_id"].to_numpy(np.int64).view(np.uint64) * _SAMPLE_MOD
        ) % np.uint64(100)
        rate = (
            batch["source"].map(rates).fillna(default_rate).to_numpy(np.uint64)
        )
        keep = gate < rate
        return batch.loc[keep, ["doc_id", "source"]]

    return _documents(sf_dir, ["doc_id", "source"]).map_batches(
        fn, batch_format="pandas"
    )


QUERIES153["source_rate_sample"] = q_stratified_sample
ORACLES153["source_rate_sample"] = """
SELECT doc_id, source
FROM documents
WHERE (CAST(doc_id AS UBIGINT) * 1000003) % 100 <
      CASE source WHEN 'web' THEN 20 WHEN 'wiki' THEN 80
                  WHEN 'code' THEN 50 ELSE 10 END
"""


def q_mixing_weights(sf_dir: str, alpha: float = 0.3):
    """Temperature-scaled source mixing weights: p_s = c_s^alpha /
    sum_t c_t^alpha with alpha = 0.3 (the standard up-weight-the-tail
    temperature). Counts are exact integers off one tiny exchange;
    powers via exp(alpha * ln(c)) — libm on both engines — and the
    normalizer is an ascending-source fold. Also reports the effective
    epochs-over-source multiplier p_s / (c_s / N)."""
    from math import exp, log

    from ..common.raytools import hash_bucket_aggregate

    counts = (
        hash_bucket_aggregate(
            _documents(sf_dir, ["source"]), ["source"], [], count_alias="n"
        )
        .to_pandas()
        .sort_values("source")
        .reset_index(drop=True)
    )
    n_total = int(counts["n"].sum())
    pw = [exp(alpha * log(float(c))) for c in counts["n"]]
    denom = 0.0
    for v in pw:  # ascending-source fold == SQL list_sum over ORDER BY source
        denom += v
    p = np.array([v / denom for v in pw], dtype=np.float64)
    share = counts["n"].to_numpy(np.float64) / float(n_total)
    return pd.DataFrame(
        {
            "source": counts["source"],
            "n_docs": counts["n"].to_numpy(np.int64),
            "weight": _r6(p),
            "epochs_multiplier": _r6(p / share),
        }
    )


QUERIES153["mixing_weights"] = q_mixing_weights
ORACLES153["mixing_weights"] = """
WITH c AS (
  SELECT source, COUNT(*) AS n FROM documents GROUP BY 1
),
t AS (
  SELECT SUM(n) AS n_total,
         list_sum(list(exp(0.3 * ln(CAST(n AS DOUBLE))) ORDER BY source))
           AS denom
  FROM c
)
SELECT c.source,
       CAST(c.n AS BIGINT) AS n_docs,
       ROUND(exp(0.3 * ln(CAST(c.n AS DOUBLE))) / t.denom, 6) AS weight,
       ROUND((exp(0.3 * ln(CAST(c.n AS DOUBLE))) / t.denom)
             / (CAST(c.n AS DOUBLE) / CAST(t.n_total AS DOUBLE)), 6)
         AS epochs_multiplier
FROM c, t
"""
