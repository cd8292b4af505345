"""Kernel tests for pipelines/queries53.py — frequency spectrum / order
size-value correlation known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries53 import (
    q_order_size_value_corr,
    q_token_freq_spectrum,
)

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_token_freq_spectrum(tmp_path):
    # a x3, b x1, c x1 -> k=1: 2 types; k=3: 1 type
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["a a a b c"],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([9], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_token_freq_spectrum(str(tmp_path)).set_index("k")
    assert out.loc[1, "n_types"] == 2
    assert out.loc[3, "n_types"] == 1
    assert out.loc[1, "vocab_share"] == round(2.0 / 3.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_order_size_value_corr(tmp_path):
    # value exactly proportional to line count -> corr 1.0
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 2, 2, 3, 3, 3], dtype=np.int64),
            "l_partkey": np.ones(6, dtype=np.int64),
            "l_suppkey": np.ones(6, dtype=np.int64),
            "l_linenumber": np.ones(6, dtype=np.int32),
            "l_quantity": [1.0] * 6,
            "l_extendedprice": [1.0] * 6,
            "l_discount": [0.0] * 6,
            "l_tax": [0.0] * 6,
            "l_returnflag": ["N"] * 6,
            "l_linestatus": ["O"] * 6,
            "l_shipdate": [D("1995-01-05")] * 6,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3], dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0, 20.0, 30.0],
            "o_orderdate": [D("1995-01-01")] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_size_value_corr(str(tmp_path))
    r = out.iloc[0]
    assert r["n_orders"] == 3
    assert r["corr"] == 1.0
