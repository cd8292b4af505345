"""Kernel test for pipelines/queries109.py — ship dow mix."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries109 import q_ship_dow_mix

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_ship_dow_mix(tmp_path):
    # 1995-01-02 was a Monday (dow 0); 1995-01-07 a Saturday (dow 5)
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [10.0] * 3,
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-02"), D("1995-01-02"),
                           D("1995-01-07")],
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_ship_dow_mix(str(tmp_path)).set_index("dow")
    assert out.loc[0, "n_shipments"] == 2
    assert out.loc[5, "n_shipments"] == 1
    assert out.loc[0, "share"] == round(2.0 / 3.0, 6)
