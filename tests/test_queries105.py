"""Kernel test for pipelines/queries105.py — conservation audit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries105 import q_tier_value_conservation


@pytest.mark.usefixtures("ray_session")
def test_tier_value_conservation(tmp_path):
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.array(
                [np.datetime64("2024-01-01T00:00:30", "us"),
                 np.datetime64("2024-01-01T00:30:00", "us"),
                 np.datetime64("2024-01-01T02:00:00", "us")],
                dtype="datetime64[us]",
            ),
            "user_id": np.ones(3, dtype=np.int64),
            "event_type": ["a"] * 3,
            "value": [1.25, 2.5, 3.0],
            "props": ["{}"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_tier_value_conservation(str(tmp_path))
    r = out.iloc[0]
    assert r["n_events"] == 3
    assert r["raw_sum"] == 6.75
    assert r["tier_sum"] == 6.75
    assert r["conserved"] == 1
