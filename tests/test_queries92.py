"""Kernel test for pipelines/queries92.py — quantity by return flag."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries92 import q_quantity_by_returnflag

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_quantity_by_returnflag(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(4, dtype=np.int64),
            "l_partkey": np.ones(4, dtype=np.int64),
            "l_suppkey": np.ones(4, dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [10.0, 20.0, 5.0, 7.0],
            "l_extendedprice": [10.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["R", "R", "N", "N"],
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [D("1995-01-05")] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_quantity_by_returnflag(str(tmp_path)).set_index("returnflag")
    assert out.loc["R", "mean_quantity"] == 15.0
    assert out.loc["N", "mean_quantity"] == 6.0
