"""Kernel test for pipelines/queries79.py — Q16-shape supplier counts."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries79 import q_supplier_count_by_part_class

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_supplier_count_by_part_class(tmp_path):
    part = pd.DataFrame(
        {
            "p_partkey": np.array([1, 2, 3], dtype=np.int64),
            "p_name": ["a", "b", "c"],
            "p_brand": ["B1", "B1", "B2"],
            "p_type": ["T"] * 3,
            "p_size": np.array([5, 15, 5], dtype=np.int64),
            "p_retailprice": [10.0] * 3,
        }
    )
    # suppliers: part1 <- s1, s2 (two shipments from s1); part2 <- s1;
    # part3 <- s3
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(5, dtype=np.int64),
            "l_partkey": np.array([1, 1, 1, 2, 3], dtype=np.int64),
            "l_suppkey": np.array([1, 1, 2, 1, 3], dtype=np.int64),
            "l_linenumber": np.ones(5, dtype=np.int32),
            "l_quantity": [1.0] * 5,
            "l_extendedprice": [10.0] * 5,
            "l_discount": [0.0] * 5,
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": [D("1995-01-05")] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(part), tmp_path / "part.parquet")
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_supplier_count_by_part_class(str(tmp_path)).set_index(
        ["brand", "size_band"]
    )
    # (B1, 0): part1 suppliers {1, 2} -> 2; (B1, 1): part2 {1} -> 1;
    # (B2, 0): part3 {3} -> 1
    assert out.loc[("B1", 0), "supplier_cnt"] == 2
    assert out.loc[("B1", 1), "supplier_cnt"] == 1
    assert out.loc[("B2", 0), "supplier_cnt"] == 1
