"""Kernel test for pipelines/queries104.py — user peak-hour share."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries104 import q_user_peak_hour_share


@pytest.mark.usefixtures("ray_session")
def test_user_peak_hour_share(tmp_path):
    # user 1: 5 events, 3 in hour 10, 2 in hour 11 -> peak share 0.6;
    # user 2: only 2 events -> filtered out (< 5).
    ts = (
        [np.datetime64("2024-01-01T10:00:00", "us")
         + np.timedelta64(j, "s") for j in range(3)]
        + [np.datetime64("2024-01-01T11:00:00", "us")
           + np.timedelta64(j, "s") for j in range(2)]
        + [np.datetime64("2024-01-01T09:00:00", "us")
           + np.timedelta64(j, "s") for j in range(2)]
    )
    users = [1] * 5 + [2] * 2
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.array(users, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": np.ones(n, dtype=np.float64),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_user_peak_hour_share(str(tmp_path))
    r = out.iloc[0]
    assert r["n_users"] == 1
    assert r["mean_peak_share"] == 0.6
