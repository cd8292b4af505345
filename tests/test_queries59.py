"""Kernel tests for pipelines/queries59.py — same-day orders / part name
terms known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries59 import (
    q_part_name_terms,
    q_same_day_orders,
)

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_same_day_orders(tmp_path):
    # cust 1 places 2 orders on the same day + 1 elsewhere; cust 2 one
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-01-01"), D("1995-01-01"),
                            D("1995-02-01"), D("1995-01-01")],
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_same_day_orders(str(tmp_path))
    r = out.iloc[0]
    assert r["n_orders"] == 4
    assert r["n_multi_pairs"] == 1
    assert r["n_clustered_orders"] == 2
    assert r["clustered_share"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_part_name_terms(tmp_path):
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(3, dtype=np.int64),
            "p_name": ["steel blue bolt", "steel red nut", "blue steel washer"],
            "p_brand": ["B"] * 3,
            "p_type": ["T"] * 3,
            "p_size": np.array([1, 1, 1], dtype=np.int32),
            "p_retailprice": [1.0] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(part), tmp_path / "part.parquet")
    out = q_part_name_terms(str(tmp_path))
    assert out.iloc[0]["token"] == "steel"
    assert out.iloc[0]["n_occurrences"] == 3
    assert out.iloc[1]["token"] == "blue"
    assert out.iloc[0]["share"] == round(3.0 / 9.0, 6)
