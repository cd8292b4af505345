"""Kernel test for pipelines/queries107.py — order value momentum."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries107 import q_order_value_momentum

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_order_value_momentum(tmp_path):
    # customer 1: 10 -> 20 -> 15 : pairs (+10, -5) -> up 1/2, mean 2.5
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0, 20.0, 15.0],
            "o_orderdate": [D("1995-01-01"), D("1995-02-01"),
                            D("1995-03-01")],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_value_momentum(str(tmp_path))
    r = out.iloc[0]
    assert r["n_pairs"] == 2
    assert r["up_share"] == 0.5
    assert r["mean_change"] == 2.5
