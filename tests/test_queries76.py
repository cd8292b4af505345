"""Kernel test for pipelines/queries76.py — Cohen's d known answer."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries76 import q_cohens_d_weekend


@pytest.mark.usefixtures("ray_session")
def test_cohens_d_weekend_known(tmp_path):
    # Weekday (Mon 2024-01-08) values {1, 3}; weekend (Sat 2024-01-06)
    # values {5, 7}: m0=200c m1=600c, v0=v1=10000c^2, pooled sd=100c,
    # d = 4.0.
    ts = [
        np.datetime64("2024-01-08T10:00:00", "us"),
        np.datetime64("2024-01-08T11:00:00", "us"),
        np.datetime64("2024-01-06T10:00:00", "us"),
        np.datetime64("2024-01-06T11:00:00", "us"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(4, dtype=np.int64),
            "event_type": ["a"] * 4,
            "value": [1.0, 3.0, 5.0, 7.0],
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_cohens_d_weekend(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_weekday"] == 2
    assert r["n_weekend"] == 2
    assert r["cohens_d"] == 4.0
