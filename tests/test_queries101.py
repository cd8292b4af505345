"""Kernel test for pipelines/queries101.py — round-value share."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries101 import q_value_round_share_by_type


@pytest.mark.usefixtures("ray_session")
def test_value_round_share_by_type(tmp_path):
    vals = [5.0, 2.5, 10.0, 7.77]
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
    out = q_value_round_share_by_type(str(tmp_path))
    r = out.iloc[0]
    assert r["n_events"] == 4
    assert r["n_whole_dollar"] == 2
    assert r["whole_share"] == 0.5
