"""Kernel tests for pipelines/queries50.py — nation revenue per customer /
vocab growth known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries50 import (
    q_nation_revenue_per_customer,
    q_vocab_growth,
)

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_nation_revenue_per_customer(tmp_path):
    nation = pd.DataFrame(
        {
            "n_nationkey": np.array([0], dtype=np.int32),
            "n_name": ["A"],
            "n_regionkey": np.array([0], dtype=np.int32),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["x", "y"],
            "c_nationkey": np.array([0, 0], dtype=np.int32),
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["B"] * 2,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.array([1, 1, 2], dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0, 20.0, 30.0],
            "o_orderdate": [D("1995-01-01")] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(nation), tmp_path / "nation.parquet")
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_nation_revenue_per_customer(str(tmp_path))
    r = out.iloc[0]
    assert r["n_customers"] == 2
    assert r["revenue_c"] == 6000
    assert r["revenue_per_cust"] == 30.0


@pytest.mark.usefixtures("ray_session")
def test_vocab_growth(tmp_path):
    # 10 docs; doc 1 has tokens a,b; doc 5 adds c; doc 10 adds d
    texts = ["a b"] + ["a"] * 3 + ["c"] + ["a"] * 4 + ["d"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(1, 11, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * 10,
            "source": ["web"] * 10,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_vocab_growth(str(tmp_path)).set_index("pct_docs")
    assert out.loc[10, "vocab_seen"] == 2   # after doc 1: a, b
    assert out.loc[50, "vocab_seen"] == 3   # after doc 5: + c
    assert out.loc[100, "vocab_seen"] == 4  # after doc 10: + d
