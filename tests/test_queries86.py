"""Kernel test for pipelines/queries86.py — weekend preference bands."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries86 import q_weekend_preference_histogram


@pytest.mark.usefixtures("ray_session")
def test_weekend_preference_histogram(tmp_path):
    # user 1: 2 weekday events (band 0); user 2: 1 weekday + 1 weekend
    # (band 5); user 3: 1 weekend event (band 10).
    ts = [
        ("2024-01-08T10:00:00", 1),  # Mon
        ("2024-01-09T10:00:00", 1),
        ("2024-01-08T10:00:00", 2),
        ("2024-01-06T10:00:00", 2),  # Sat
        ("2024-01-07T10:00:00", 3),  # Sun
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": np.array([np.datetime64(t, "us") for t, _ in ts],
                           dtype="datetime64[us]"),
            "user_id": np.array([u for _, u in ts], dtype=np.int64),
            "event_type": ["a"] * 5,
            "value": np.ones(5, dtype=np.float64),
            "props": ["{}"] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_weekend_preference_histogram(str(tmp_path)).set_index("band")
    assert out.loc[0, "n_users"] == 1
    assert out.loc[5, "n_users"] == 1
    assert out.loc[10, "n_users"] == 1
