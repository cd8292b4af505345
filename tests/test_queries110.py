"""Kernel test for pipelines/queries110.py — ts resolution audit."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries110 import q_ts_resolution_audit


@pytest.mark.usefixtures("ray_session")
def test_ts_resolution_audit(tmp_path):
    ts = [
        np.datetime64("2024-01-01T00:00:00.000000", "us"),  # whole second
        np.datetime64("2024-01-01T00:00:00.500000", "us"),  # sub-second
        np.datetime64("2024-01-01T00:00:00.000123", "us"),  # sub-milli
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(3, dtype=np.int64),
            "event_type": ["a"] * 3,
            "value": np.ones(3, dtype=np.float64),
            "props": ["{}"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_ts_resolution_audit(str(tmp_path))
    r = out.iloc[0]
    assert r["n_events"] == 3
    assert r["subsecond_share"] == round(2.0 / 3.0, 6)
    assert r["submilli_share"] == round(1.0 / 3.0, 6)
