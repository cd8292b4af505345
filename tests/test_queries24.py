"""Kernel tests for pipelines/queries24.py — user entropy / ACF decay /
daily moments / priority-segment matrix known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries24 import (
    q_acf_decay_time,
    q_daily_moments,
    q_priority_segment_matrix,
    q_user_type_entropy,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


def _events(types, users=None, days=None, hours=None):
    n = len(types)
    off = [
        (days[i] * DAY_US if days else 0) + (hours[i] * HOUR_US if hours else 0) + i
        for i in range(n)
    ]
    ts = np.array([T0 + o for o in off], dtype=np.int64)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_user_type_entropy_known(tmp_path):
    # user 1: all 'a' -> H=0; user 2: a,b equally -> H=ln 2; mean = ln2/2
    types = ["a", "a", "a", "a", "a", "b", "a", "b"]
    users = [1, 1, 1, 1, 2, 2, 2, 2]
    pq.write_table(_events(types, users=users), tmp_path / "events.parquet")
    out = q_user_type_entropy(str(tmp_path))
    r = out.iloc[0]
    assert r["n_users"] == 2
    assert r["mean_entropy"] == round(math.log(2.0) / 2.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_acf_decay_alternating(tmp_path):
    # alternating hourly load: r1 ~ -1 < 1/e -> decay lag = 1
    counts = [5 if h % 2 == 0 else 1 for h in range(48)]
    types = ["view"] * sum(counts)
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    pq.write_table(
        _events(types, hours=hours), tmp_path / "events.parquet"
    )
    out = q_acf_decay_time(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["decay_lag_h"] == 1
    assert r["acf_at_decay"] < 0


@pytest.mark.usefixtures("ray_session")
def test_daily_moments_symmetric(tmp_path):
    # daily counts 1,2,3 -> mean 2, var 2/3, skew 0
    days = [0] * 1 + [1] * 2 + [2] * 3
    pq.write_table(
        _events(["view"] * len(days), days=days), tmp_path / "events.parquet"
    )
    out = q_daily_moments(str(tmp_path))
    r = out.iloc[0]
    assert r["n_days"] == 3 and r["total"] == 6
    assert r["mean_daily"] == 2.0
    assert r["var_daily"] == round(2.0 / 3.0, 6)
    assert r["skew_daily"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_priority_segment_matrix(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 1, 2, 2], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-01-01")] * 4,
            "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT", "1-URGENT"],
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["A", "B"],
            "c_nationkey": np.array([0, 0], dtype=np.int32),
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING", "MACHINERY"],
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    out = q_priority_segment_matrix(str(tmp_path)).set_index(["priority", "segment"])
    assert out.loc[("1-URGENT", "BUILDING"), "n_orders"] == 1
    assert out.loc[("1-URGENT", "BUILDING"), "segment_share"] == 0.5
    assert out.loc[("1-URGENT", "MACHINERY"), "segment_share"] == 1.0
