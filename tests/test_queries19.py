"""Kernel tests for pipelines/queries19.py — spectral entropy / token
dispersion / segment quartiles / return rate known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries19 import (
    q_return_rate_monthly,
    q_segment_order_quartiles,
    q_spectral_entropy,
    q_token_dispersion,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000
D = lambda s: np.datetime64(s, "us")


def _events_by_hour(counts):
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    n = len(hours)
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_spectral_entropy_pure_tone(tmp_path):
    # a pure 24h sinusoid concentrates power in the 24h bin -> low entropy
    counts = [int(50 + 40 * math.cos(2 * math.pi * h / 24)) for h in range(96)]
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_spectral_entropy(str(tmp_path))
    r = out.iloc[0]
    assert r["n"] == 96
    assert r["p24"] > r["p12"] and r["p24"] > r["p8"] and r["p24"] > r["p6"]
    assert r["spec_entropy"] < 0.5  # far below ln(4) ~ 1.386


@pytest.mark.usefixtures("ray_session")
def test_token_dispersion_bursty_vs_even(tmp_path):
    # 'the' appears once in every doc (VMR -> 0); 'topic' is bursty
    texts = ["the filler"] * 9 + ["the topic topic topic topic topic"]
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(10, dtype=np.int64),
            "text": texts,
            "lang": ["en"] * 10,
            "source": ["web"] * 10,
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_token_dispersion(str(tmp_path)).set_index("token")
    # the: c=1 in all 10 docs -> mean 1, var 0 -> VMR 0
    assert out.loc["the", "vmr"] == 0.0
    # topic: one doc with 5 -> mean .5, E[c^2]=2.5 -> var 2.25 -> VMR 4.5
    assert out.loc["topic", "vmr"] == 4.5


@pytest.mark.usefixtures("ray_session")
def test_segment_order_quartiles(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 1, 2, 2], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [10.0, 20.0, 30.0, 40.0],
            "o_orderdate": [D("1995-01-01")] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["A", "B"],
            "c_nationkey": np.array([0, 0], dtype=np.int32),
            "c_acctbal": [0.0, 0.0],
            "c_mktsegment": ["BUILDING", "BUILDING"],
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    out = q_segment_order_quartiles(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_orders"] == 4 and r["total_c"] == 10000
    assert r["q1_c"] == 1000 and r["q2_c"] == 2000 and r["q3_c"] == 3000


@pytest.mark.usefixtures("ray_session")
def test_return_rate_monthly(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(4, dtype=np.int64),
            "l_partkey": np.ones(4, dtype=np.int64),
            "l_suppkey": np.ones(4, dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [100.0, 100.0, 100.0, 300.0],
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["R", "N", "N", "R"],
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [D("1995-01-05"), D("1995-01-06"),
                           D("1995-02-01"), D("1995-02-02")],
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_return_rate_monthly(str(tmp_path)).set_index("month_us")
    jan = int(np.datetime64("1995-01-01", "us").view(np.int64))
    feb = int(np.datetime64("1995-02-01", "us").view(np.int64))
    assert out.loc[jan, "item_rate"] == 0.5
    assert out.loc[jan, "value_rate"] == 0.5
    assert out.loc[feb, "item_rate"] == 0.5
    assert out.loc[feb, "value_rate"] == 0.75  # 300 of 400
