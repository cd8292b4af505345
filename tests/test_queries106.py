"""Kernel test for pipelines/queries106.py — peak hour offset."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries106 import q_peak_hour_offset_by_type


@pytest.mark.usefixtures("ray_session")
def test_peak_hour_offset(tmp_path):
    # type a peaks at hod 2 (2 events), type b at hod 23 (3 events):
    # global peak hod 23 -> offsets: a = (2-23+24)%24 = 3, b = 0
    rows = (
        [("2024-01-01T02:00:00", "a")] * 2
        + [("2024-01-01T23:00:00", "b")] * 3
    )
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array([np.datetime64(t, "us") for t, _ in rows],
                           dtype="datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": [e for _, e in rows],
            "value": np.ones(n, dtype=np.float64),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_peak_hour_offset_by_type(str(tmp_path)).set_index("event_type")
    assert out.loc["a", "peak_hod"] == 2
    assert out.loc["a", "global_peak_hod"] == 23
    assert out.loc["a", "offset_hours"] == 3
    assert out.loc["b", "offset_hours"] == 0
