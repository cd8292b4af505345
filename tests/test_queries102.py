"""Kernel test for pipelines/queries102.py — type first seen."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries102 import q_type_first_seen


@pytest.mark.usefixtures("ray_session")
def test_type_first_seen(tmp_path):
    rows = [
        ("2024-01-01T08:00:00", "a"),
        ("2024-01-03T09:00:00", "b"),
        ("2024-01-05T10:00:00", "a"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.array([np.datetime64(t, "us") for t, _ in rows],
                           dtype="datetime64[us]"),
            "user_id": np.ones(3, dtype=np.int64),
            "event_type": [e for _, e in rows],
            "value": np.ones(3, dtype=np.float64),
            "props": ["{}"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_type_first_seen(str(tmp_path)).set_index("event_type")
    assert out.loc["a", "days_from_start"] == 0
    assert out.loc["b", "days_from_start"] == 2
    assert out.loc["b", "first_ts"] == np.datetime64("2024-01-03T09:00:00", "us")
