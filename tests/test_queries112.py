"""Kernel test for pipelines/queries112.py — zero-value share."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries112 import q_zero_value_share


@pytest.mark.usefixtures("ray_session")
def test_zero_value_share(tmp_path):
    vals = [0.0, 1.5, 0.0, 2.0]
    n = len(vals)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")] * n,
                dtype="datetime64[us]",
            ),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": vals,
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_zero_value_share(str(tmp_path))
    r = out.iloc[0]
    assert r["n_events"] == 4
    assert r["n_zero"] == 2
    assert r["zero_share"] == 0.5
