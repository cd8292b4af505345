"""Kernel test for pipelines/queries84.py — tenure bands known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries84 import q_value_by_tenure_band


@pytest.mark.usefixtures("ray_session")
def test_value_by_tenure_band(tmp_path):
    # user 1: first event at t0 (value 2), second 8 days later (value 4)
    # -> bands 0 and 1 with means 2.0 and 4.0
    ts = [
        np.datetime64("2024-01-01T00:00:00", "us"),
        np.datetime64("2024-01-09T00:00:00", "us"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(2, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(2, dtype=np.int64),
            "event_type": ["a", "a"],
            "value": [2.0, 4.0],
            "props": ["{}"] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_value_by_tenure_band(str(tmp_path)).set_index("tenure_weeks")
    assert out.loc[0, "n_events"] == 1
    assert out.loc[0, "mean_value"] == 2.0
    assert out.loc[1, "n_events"] == 1
    assert out.loc[1, "mean_value"] == 4.0
