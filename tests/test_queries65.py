"""Kernel tests for pipelines/queries65.py — ordinal patterns / SampEn /
Grubbs known answers on a hand-built hourly series."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries65 import (
    q_grubbs_test,
    q_permutation_entropy,
    q_sample_entropy,
)


def _events(counts, tmp_path):
    """One event per unit of count, all type 'a', hour i -> counts[i]."""
    ts = []
    base = np.datetime64("2024-01-01T00:30:00", "us")
    for i, c in enumerate(counts):
        for j in range(c):
            ts.append(base + np.timedelta64(i, "h") + np.timedelta64(j, "s"))
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": np.ones(n, dtype=np.float64),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    return str(tmp_path)


@pytest.mark.usefixtures("ray_session")
def test_permutation_entropy_known(tmp_path):
    # counts 1,2,3,2 -> triples (1,2,3) asc = code 7, (2,3,2) = 4*1+2*1+0 = 6
    sf = _events([1, 2, 3, 2], tmp_path)
    out = q_permutation_entropy(sf).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_triples"] == 2
    assert r["n_patterns"] == 2
    assert r["modal_pattern"] == 6  # tie on count -> smallest code wins
    assert r["perm_entropy"] == round(math.log(2.0), 6)


@pytest.mark.usefixtures("ray_session")
def test_sample_entropy_known(tmp_path):
    # Constant-ish series 1,1,1,1,1: sd == 0 -> dropped (empty result).
    sf = _events([1, 1, 1, 1, 1], tmp_path)
    out = q_sample_entropy(sf).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_sample_entropy_periodic(tmp_path):
    # Strict period-2 series: every template pair matches at m=2 AND m=3
    # (within any r >= 1), so A == B and SampEn == 0.
    sf = _events([1, 3, 1, 3, 1, 3, 1, 3], tmp_path)
    out = q_sample_entropy(sf).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["tolerance_r"] >= 1
    # templates start at idx 0..5; pairs with both (2-)and(3-)matches are
    # the same-parity pairs: (0,2),(0,4),(1,3),(1,5),(2,4),(3,5)
    assert r["b_pairs"] == r["a_pairs"]
    assert r["sampen"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_grubbs_known(tmp_path):
    counts = [2, 2, 2, 10]
    sf = _events(counts, tmp_path)
    out = q_grubbs_test(sf).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    x = np.array(counts, dtype=float)
    m = x.mean()
    sd = math.sqrt(((x - m) ** 2).mean())
    assert r["peak_idx"] == 3
    assert r["peak_count"] == 10
    assert r["grubbs_g"] == round(abs(10 - m) / sd, 6)
