"""Kernel test for pipelines/queries70.py — revenue matrix known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries70 import q_qty_discount_revenue_matrix

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_qty_discount_matrix(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [5.0, 15.0, 17.0],
            "l_extendedprice": [100.0, 200.0, 100.0],
            "l_discount": [0.0, 0.05, 0.05],
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_qty_discount_revenue_matrix(str(tmp_path)).set_index(
        ["q_band", "d_pct"]
    )
    assert len(out) == 2
    assert out.loc[(0, 0), "n_items"] == 1
    assert out.loc[(0, 0), "revenue"] == 100.0
    # band (1, 5): items at 200 and 100 with 5% off -> 285.0
    assert out.loc[(1, 5), "n_items"] == 2
    assert out.loc[(1, 5), "revenue"] == 285.0
