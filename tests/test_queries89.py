"""Kernel test for pipelines/queries89.py — month cascade exactness."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries89 import q_rollup_1mo_cascade


@pytest.mark.usefixtures("ray_session")
def test_rollup_1mo_cascade(tmp_path):
    # Jan events values {1, 3}; Feb event {5} — one type.
    ts = [
        np.datetime64("2024-01-05T10:00:00", "us"),
        np.datetime64("2024-01-20T23:59:59", "us"),
        np.datetime64("2024-02-01T00:00:00", "us"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(3, dtype=np.int64),
            "event_type": ["a"] * 3,
            "value": [1.0, 3.0, 5.0],
            "props": ["{}"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = (
        q_rollup_1mo_cascade(str(tmp_path))
        .to_pandas()
        .set_index("bucket_ts")
        .sort_index()
    )
    jan = out.loc[np.datetime64("2024-01-01", "us")]
    feb = out.loc[np.datetime64("2024-02-01", "us")]
    assert jan["cnt"] == 2
    assert jan["sum_value"] == 4.0
    assert jan["min_value"] == 1.0
    assert jan["max_value"] == 3.0
    assert jan["mean_value"] == 2.0
    assert feb["cnt"] == 1
    assert feb["sum_value"] == 5.0
