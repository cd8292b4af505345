"""Kernel tests for pipelines/queries49.py — order Gini / active days
histogram known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries49 import (
    q_active_days_histogram,
    q_order_gini,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_order_gini_equal_is_zero(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 2, 3, 4], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-01-01")] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_gini(str(tmp_path))
    r = out.iloc[0]
    assert r["n_customers"] == 4 and r["n_orders"] == 4
    assert r["gini"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_active_days_histogram(tmp_path):
    # user 1 active on 2 days; user 2 on 1 day
    users = [1, 1, 1, 2]
    days = [0, 0, 1, 3]
    ts = [T0 + d * DAY_US + i for i, d in enumerate(days)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * 4),
            "value": pa.array([1.0] * 4, pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_active_days_histogram(str(tmp_path)).set_index("active_days")
    assert out.loc[2, "n_users"] == 1
    assert out.loc[1, "n_users"] == 1
