"""Kernel test for pipelines/queries113.py — order quarter mix."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries113 import q_order_quarter_mix

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_order_quarter_mix(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0] * 3,
            "o_orderdate": [D("1995-02-15"), D("1995-03-01"),
                            D("1995-11-20")],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_quarter_mix(str(tmp_path)).set_index(["year", "quarter"])
    assert out.loc[(1995, 1), "n_orders"] == 2
    assert out.loc[(1995, 4), "n_orders"] == 1
    assert out.loc[(1995, 1), "share"] == round(2.0 / 3.0, 6)
