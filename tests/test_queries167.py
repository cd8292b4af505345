"""Kernel tests for pipelines/queries167.py — Fano/branching and the
hash-collision audit."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_fano_poisson_vs_clustered(tmp_path):
    """A metronome stream is underdispersed (Fano < 1, branching 0);
    a bursty stream is overdispersed at the 1h window."""
    from signalsharp_ray.pipelines.queries167 import q_fano_branching

    hours = pd.date_range("2024-01-01", periods=48, freq="1h")
    steady = np.full(48, 3)
    bursty = np.where(np.arange(48) % 8 == 0, 17, 1)
    ts, et = [], []
    for h, a, b in zip(hours, steady, bursty):
        ts.extend([h] * int(a))
        et.extend(["steady"] * int(a))
        ts.extend([h] * int(b))
        et.extend(["bursty"] * int(b))
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": pd.DatetimeIndex(ts),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": et,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_fano_branching(str(tmp_path))
    s1 = out[(out["event_type"] == "steady") & (out["window_h"] == 1)].iloc[0]
    b1 = out[(out["event_type"] == "bursty") & (out["window_h"] == 1)].iloc[0]
    assert s1["fano"] == 0.0 and s1["branching"] == 0.0
    assert b1["fano"] > 5.0
    assert 0.0 < b1["branching"] < 1.0
    # three window sizes per type
    assert sorted(out["window_h"].unique()) == [1, 6, 24]


@pytest.mark.usefixtures("ray_session")
def test_hash_collision_audit_exact(tmp_path):
    """Known texts: observed pairs match a direct md5-prefix count,
    duplicates inflate the ratio."""
    from signalsharp_ray.pipelines.queries167 import q_hash_collision_audit

    texts = ["alpha", "beta", "gamma", "alpha", "alpha"]  # 3 dup pairs
    df = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": "s0",
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = q_hash_collision_audit(str(tmp_path))
    r = out.iloc[0]
    assert r["n_docs"] == 5
    buckets = [
        int(hashlib.md5(t.encode()).hexdigest()[:4], 16) for t in texts
    ]
    from collections import Counter

    obs = sum(c * (c - 1) // 2 for c in Counter(buckets).values())
    assert r["observed_pairs"] == obs >= 3  # the 3 'alpha' pairs
    assert r["expected_pairs"] == pytest.approx(5 * 4 / 2 / 65536, abs=1e-6)
    assert r["ratio"] > 1000  # duplicates blow the birthday bound
