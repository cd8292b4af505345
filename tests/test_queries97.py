"""Kernel test for pipelines/queries97.py — part revenue top share."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries97 import q_part_revenue_topshare

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_part_revenue_topshare(tmp_path):
    # parts 1..3 with revenues 100, 50, 50 -> k = max(1, 3//100) = 1,
    # top share = 0.5
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.array([1, 2, 3], dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [100.0, 50.0, 50.0],
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_part_revenue_topshare(str(tmp_path))
    r = out.iloc[0]
    assert r["n_parts"] == 3
    assert r["k_top"] == 1
    assert r["top_share"] == 0.5
