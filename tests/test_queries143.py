"""Kernel tests for pipelines/queries143.py — interval predicate edge
cases and cross-source prefix sharing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_interval_coverage_flat_then_spike(tmp_path):
    from signalsharp_ray.pipelines.queries143 import q_interval_coverage_24h

    # 24h of exactly 2/hour (zero-variance window), then:
    # hour 24 = 2 (covered: equals mean exactly), hour 25 = 50 (a spike
    # against a near-flat window -> not covered)
    ts = []
    for h in range(24):
        ts += [f"2024-01-01 {h:02d}:00:30"] * 2
    ts += ["2024-01-02 00:00:30"] * 2
    ts += ["2024-01-02 01:00:30"] * 50
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(ts), dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(len(ts), dtype=np.int64),
            "event_type": "t",
            "value": np.ones(len(ts)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_interval_coverage_24h(str(tmp_path))
    r = out.iloc[0]
    assert r["n_checked"] == 2
    assert r["n_covered"] == 1  # the flat continuation; the spike missed
    assert r["coverage"] == pytest.approx(0.5)


@pytest.mark.usefixtures("ray_session")
def test_cross_source_prefix_matrix(tmp_path):
    from signalsharp_ray.pipelines.queries143 import q_cross_source_dup_matrix

    shared = "w1 w2 w3 w4 w5 w6 w7 w8"
    texts = [
        shared + " tail one",      # s0
        shared + " other ending",  # s1 shares the 8-token prefix
        "totally different words here beyond any shared prefix run",  # s2
    ]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": ["s0", "s1", "s2"],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = q_cross_source_dup_matrix(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("s0", "s1")
    assert r["n_shared_fingerprints"] == 1
