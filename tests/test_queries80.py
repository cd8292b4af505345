"""Kernel test for pipelines/queries80.py — line-count histogram."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries80 import q_order_linecount_histogram

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_order_linecount_histogram(tmp_path):
    # orders: 1 -> 3 lines, 2 -> 1 line, 3 -> 1 line
    ok = [1, 1, 1, 2, 3]
    n = len(ok)
    li = pd.DataFrame(
        {
            "l_orderkey": np.array(ok, dtype=np.int64),
            "l_partkey": np.ones(n, dtype=np.int64),
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_linenumber": np.ones(n, dtype=np.int32),
            "l_quantity": [1.0] * n,
            "l_extendedprice": [10.0] * n,
            "l_discount": [0.0] * n,
            "l_tax": [0.0] * n,
            "l_returnflag": ["N"] * n,
            "l_linestatus": ["O"] * n,
            "l_shipdate": [D("1995-01-05")] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_order_linecount_histogram(str(tmp_path)).set_index(
        "lines_per_order"
    )
    assert out.loc[1, "n_orders"] == 2
    assert out.loc[3, "n_orders"] == 1
