"""Kernel tests for pipelines/queries52.py — doc TTR mean / hour
coverage known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries52 import q_doc_ttr_mean, q_hour_coverage

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
def test_doc_ttr_mean(tmp_path):
    # doc 1: "a a b b" -> TTR 0.5; doc 2: "x y" -> 1.0; mean 0.75
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["a a b b", "x y"],
            "lang": ["en"] * 2,
            "source": ["web"] * 2,
            "n_chars": np.array([7, 3], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_doc_ttr_mean(str(tmp_path))
    r = out.iloc[0]
    assert r["n_docs"] == 2
    assert r["mean_ttr"] == 0.75


@pytest.mark.usefixtures("ray_session")
def test_hour_coverage(tmp_path):
    # events at hours 0, 1, 4 -> span 5, present 3, coverage 0.6
    hours = [0, 1, 4]
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(3), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 3, pa.int64()),
            "event_type": pa.array(["view"] * 3),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_hour_coverage(str(tmp_path))
    r = out.iloc[0]
    assert r["span_hours"] == 5
    assert r["present_hours"] == 3
    assert r["coverage"] == 0.6
