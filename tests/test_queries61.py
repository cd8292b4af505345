"""Kernel test for pipelines/queries61.py — 80/20 point known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries61 import q_pareto_8020_point

T0 = pd.Timestamp("2024-01-01").value // 1000


@pytest.mark.usefixtures("ray_session")
def test_pareto_8020_point(tmp_path):
    # user 1: 8 events, users 2-3: 1 each -> total 10; top-1 carries 80%
    users = [1] * 8 + [2, 3]
    ts = [T0 + i for i in range(10)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(10), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * 10),
            "value": pa.array([1.0] * 10, pa.float64()),
            "props": pa.array(["{}"] * 10),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_pareto_8020_point(str(tmp_path))
    r = out.iloc[0]
    assert r["n_users"] == 3
    assert r["k_users"] == 1
    assert r["event_share"] == 0.8
    assert r["user_share"] == round(1.0 / 3.0, 6)
