"""Kernel tests for pipelines/queries46.py — value autocorrelation /
DAU stability known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries46 import (
    q_dau_stability,
    q_value_autocorr,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000


def _events(values=None, users=None, days=None, n=None):
    n = n or len(values or users or days)
    ts = [T0 + (days[i] if days else 0) * DAY_US + i for i in range(n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(values or [1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_value_autocorr_alternating(tmp_path):
    # alternating small/large values -> strongly negative lag-1 corr
    values = [1.0 if i % 2 == 0 else 9.0 for i in range(40)]
    pq.write_table(_events(values=values), tmp_path / "events.parquet")
    out = q_value_autocorr(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_pairs"] == 39
    assert r["value_autocorr"] < -0.9


@pytest.mark.usefixtures("ray_session")
def test_dau_stability(tmp_path):
    # day 0: users {1,2} -> 2 DAU; day 1: users {1} -> 1 DAU
    users = [1, 2, 2, 1]
    days = [0, 0, 0, 1]
    pq.write_table(
        _events(users=users, days=days), tmp_path / "events.parquet"
    )
    out = q_dau_stability(str(tmp_path))
    r = out.iloc[0]
    assert r["n_days"] == 2
    assert r["mean_dau"] == 1.5
    # values 2, 1 -> pop sd 0.5 -> cv = 1/3
    assert r["cv_dau"] == round(0.5 / 1.5, 6)
