"""Kernel tests for pipelines/queries43.py — load state transitions /
order value by priority / weekly growth known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries43 import (
    q_load_state_transitions,
    q_order_value_by_priority,
    q_weekly_growth,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
WEEK_US = 7 * 86_400_000_000
D = lambda s: np.datetime64(s, "us")


def _events_by_hour(counts):
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    n = len(ts)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_load_state_transitions_sticky(tmp_path):
    # long low block then long high block -> diagonal-dominant matrix
    counts = [1] * 12 + [100] * 12
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_load_state_transitions(str(tmp_path)).set_index(
        ["from_state", "to_state"]
    )
    # low block is states 1-2, high block 3-4; most transitions stay put
    diag = sum(
        int(out.loc[(s, s), "n_transitions"])
        for s in (1, 2, 3, 4)
        if (s, s) in out.index
    )
    total = int(out["n_transitions"].sum())
    assert total == 23
    assert diag / total > 0.7


@pytest.mark.usefixtures("ray_session")
def test_order_value_by_priority(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.ones(4, dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [10.0, 30.0, 20.0, 20.0],
            "o_orderdate": [D("1995-01-01")] * 4,
            "o_orderpriority": ["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"],
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_value_by_priority(str(tmp_path)).set_index("priority")
    assert out.loc["1-URGENT", "mean_value"] == 20.0
    # urgent: values 10, 30 -> sd 10 -> cv 0.5
    assert out.loc["1-URGENT", "cv"] == 0.5
    assert out.loc["2-HIGH", "cv"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_weekly_growth(tmp_path):
    # week 0: 4 events; week 1: 8 events -> ln 2
    ts = [T0 + i for i in range(4)] + [T0 + WEEK_US + i for i in range(8)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(12), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 12, pa.int64()),
            "event_type": pa.array(["view"] * 12),
            "value": pa.array([1.0] * 12, pa.float64()),
            "props": pa.array(["{}"] * 12),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_weekly_growth(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_events"] == 8 and r["n_prev"] == 4
    assert r["ln_growth"] == round(math.log(2.0), 6)
