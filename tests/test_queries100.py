"""Kernel test for pipelines/queries100.py — type run histogram."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries100 import q_type_run_histogram


@pytest.mark.usefixtures("ray_session")
def test_type_run_histogram(tmp_path):
    # user 1: a a a b -> max run 3; user 2: a b -> max run 1
    rows = [
        (1, "a"), (1, "a"), (1, "a"), (1, "b"),
        (2, "a"), (2, "b"),
    ]
    ts = [np.datetime64("2024-01-01T00:00:00", "us")
          + np.timedelta64(i, "m") for i in range(len(rows))]
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.array([u for u, _ in rows], dtype=np.int64),
            "event_type": [e for _, e in rows],
            "value": np.ones(len(rows), dtype=np.float64),
            "props": ["{}"] * len(rows),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_type_run_histogram(str(tmp_path)).set_index("max_run")
    assert out.loc[3, "n_users"] == 1
    assert out.loc[1, "n_users"] == 1
