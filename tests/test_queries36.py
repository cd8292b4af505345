"""Kernel tests for pipelines/queries36.py — nation intensity / halves
drift / numeric token share known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries36 import (
    q_halves_drift,
    q_nation_order_intensity,
    q_numeric_token_share,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_nation_order_intensity(tmp_path):
    nation = pd.DataFrame(
        {
            "n_nationkey": np.array([0, 1], dtype=np.int32),
            "n_name": ["A", "B"],
            "n_regionkey": np.array([0, 0], dtype=np.int32),
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], dtype=np.int64),
            "c_name": ["x", "y", "z"],
            "c_nationkey": np.array([0, 0, 1], dtype=np.int32),
            "c_acctbal": [0.0] * 3,
            "c_mktsegment": ["B"] * 3,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 1, 2, 3], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-01-01")] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(nation), tmp_path / "nation.parquet")
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_nation_order_intensity(str(tmp_path)).set_index("n_name")
    assert out.loc["A", "n_customers"] == 2
    assert out.loc["A", "n_orders"] == 3
    assert out.loc["A", "orders_per_cust"] == 1.5
    assert out.loc["B", "orders_per_cust"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_halves_drift(tmp_path):
    # window [0h, 10h]; mid = 5h. 2 events before, 6 at/after -> ln 3
    hours = [0, 1, 5, 6, 7, 8, 9, 10]
    ts = [T0 + h * HOUR_US for h in hours]
    tbl = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 8, pa.int64()),
            "event_type": pa.array(["view"] * 8),
            "value": pa.array([1.0] * 8, pa.float64()),
            "props": pa.array(["{}"] * 8),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_halves_drift(str(tmp_path))
    r = out.iloc[0]
    assert r["n_first"] == 2 and r["n_second"] == 6
    assert r["ln_ratio"] == round(math.log(3.0), 6)


@pytest.mark.usefixtures("ray_session")
def test_numeric_token_share(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["price 100 euros 42 total"],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([24], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_numeric_token_share(str(tmp_path))
    r = out.iloc[0]
    assert r["n_tokens"] == 5
    assert r["n_numeric"] == 2
    assert r["numeric_share"] == 0.4
