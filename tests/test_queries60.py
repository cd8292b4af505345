"""Kernel tests for pipelines/queries60.py — type value mix / order
reconciliation known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries60 import (
    q_order_total_reconciliation,
    q_type_value_mix,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_type_value_mix(tmp_path):
    types = ["a", "a", "b"]
    values = [10.0, 20.0, 30.0]
    ts = [T0 + i for i in range(3)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(3), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 3, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_type_value_mix(str(tmp_path)).set_index("event_type")
    assert out.loc["a", "value_c"] == 3000
    assert out.loc["a", "value_share"] == 0.5
    assert out.loc["b", "value_share"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_order_total_reconciliation(tmp_path):
    # order 1: line 100 * (1-0) * (1+0) = 100 == header -> exact
    # order 2: lines sum 200 but header 250 -> over (header > derived)
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 2, 2], dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [100.0, 150.0, 50.0],
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.ones(2, dtype=np.int64),
            "o_orderstatus": ["O"] * 2,
            "o_totalprice": [100.0, 250.0],
            "o_orderdate": [D("1995-01-01")] * 2,
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_total_reconciliation(str(tmp_path))
    r = out.iloc[0]
    assert r["n_orders"] == 2
    assert r["n_exact"] == 1
    assert r["n_over"] == 1
    assert r["n_under"] == 0
    assert r["mean_abs_gap"] == 25.0  # 50 dollars gap / 2 orders
