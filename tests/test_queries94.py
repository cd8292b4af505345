"""Kernel test for pipelines/queries94.py — balance-band order rate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries94 import q_order_rate_by_balance_band

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_order_rate_by_balance_band(tmp_path):
    # customer 1: balance -500 -> band -1; customer 2: 1500 -> band 1.
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["a", "b"],
            "c_nationkey": np.zeros(2, dtype=np.int64),
            "c_acctbal": [-500.0, 1500.0],
            "c_mktsegment": ["AUTO"] * 2,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.array([2, 2, 2], dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0] * 3,
            "o_orderdate": [D("1995-01-05")] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_rate_by_balance_band(str(tmp_path)).set_index(
        "balance_band"
    )
    assert out.loc[-1, "n_customers"] == 1
    assert out.loc[-1, "n_orders"] == 0
    assert out.loc[-1, "orders_per_customer"] == 0.0
    assert out.loc[1, "n_orders"] == 3
    assert out.loc[1, "orders_per_customer"] == 3.0
