"""Kernel tests for pipelines/queries26.py — Mann-Kendall / cross
entropy / session threshold curve known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries26 import (
    q_mann_kendall,
    q_session_threshold_curve,
    q_source_cross_entropy,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
MINUTE_US = 60_000_000


def _events(hours=None, ts_us=None, users=None):
    if ts_us is None:
        ts_us = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    n = len(ts_us)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts_us, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_mann_kendall_monotone(tmp_path):
    # strictly increasing hourly counts -> S = n(n-1)/2, strong positive z
    counts = [i + 1 for i in range(12)]
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    pq.write_table(_events(hours=hours), tmp_path / "events.parquet")
    out = q_mann_kendall(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_hours"] == 12
    assert r["s_stat"] == 66  # 12*11/2
    assert r["zscore"] > 4


@pytest.mark.usefixtures("ray_session")
def test_source_cross_entropy_identical_is_zero_kl(tmp_path):
    # single source: cross entropy == own entropy -> KL = 0
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["a a b", "b c"],
            "lang": ["en"] * 2,
            "source": ["web"] * 2,
            "n_chars": np.array([5, 3], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_source_cross_entropy(str(tmp_path))
    r = out.iloc[0]
    assert r["n_tokens"] == 5
    assert r["kl"] == 0.0
    assert r["cross_entropy"] == r["h_source"]


@pytest.mark.usefixtures("ray_session")
def test_session_threshold_curve(tmp_path):
    # one user: gaps of 20 min and 45 min
    ts = [T0, T0 + 20 * MINUTE_US, T0 + 65 * MINUTE_US]
    pq.write_table(_events(ts_us=ts), tmp_path / "events.parquet")
    out = q_session_threshold_curve(str(tmp_path)).set_index("threshold_min")
    # 15min: both gaps break -> 3 sessions; 30min: one break -> 2; 60min: 1
    assert out.loc[15, "n_sessions"] == 3
    assert out.loc[30, "n_sessions"] == 2
    assert out.loc[60, "n_sessions"] == 1
    assert (out["n_users"] == 1).all()
