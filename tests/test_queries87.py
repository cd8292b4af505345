"""Kernel test for pipelines/queries87.py — monthly churn known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries87 import q_monthly_churn


@pytest.mark.usefixtures("ray_session")
def test_monthly_churn(tmp_path):
    # Jan: users {1, 2}; Feb: users {2, 3} -> Jan row: active 2,
    # retained 1, churn 0.5. (No March -> no Feb row.)
    ts = [
        ("2024-01-05T00:00:00", 1),
        ("2024-01-06T00:00:00", 2),
        ("2024-02-05T00:00:00", 2),
        ("2024-02-06T00:00:00", 3),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": np.array([np.datetime64(t, "us") for t, _ in ts],
                           dtype="datetime64[us]"),
            "user_id": np.array([u for _, u in ts], dtype=np.int64),
            "event_type": ["a"] * 4,
            "value": np.ones(4, dtype=np.float64),
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_monthly_churn(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["month_key"] == 2024 * 12 + 1
    assert r["n_active"] == 2
    assert r["n_retained"] == 1
    assert r["churn_rate"] == 0.5
