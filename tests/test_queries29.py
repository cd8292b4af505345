"""Kernel tests for pipelines/queries29.py — vocab overlap / balance
correlation / co-exceedance known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries29 import (
    q_balance_order_corr,
    q_co_exceedance,
    q_vocab_overlap,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_vocab_overlap_known(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["a b c", "b c d e"],
            "lang": ["en"] * 2,
            "source": ["web", "wiki"],
            "n_chars": np.array([5, 7], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_vocab_overlap(str(tmp_path))
    r = out.iloc[0]
    assert r["source_a"] == "web" and r["source_b"] == "wiki"
    assert r["vocab_a"] == 3 and r["vocab_b"] == 4
    assert r["intersection"] == 2 and r["vocab_union"] == 5
    assert r["jaccard"] == 0.4


@pytest.mark.usefixtures("ray_session")
def test_balance_order_corr_perfect(tmp_path):
    # spend exactly proportional to balance -> corr 1.0
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2, 3], dtype=np.int64),
            "c_name": ["a", "b", "c"],
            "c_nationkey": np.array([0, 0, 0], dtype=np.int32),
            "c_acctbal": [10.0, 20.0, 30.0],
            "c_mktsegment": ["B"] * 3,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.array([1, 2, 3], dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [100.0, 200.0, 300.0],
            "o_orderdate": [D("1995-01-01")] * 3,
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_balance_order_corr(str(tmp_path))
    r = out.iloc[0]
    assert r["n_customers"] == 3
    assert r["corr"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_co_exceedance_synchronized(tmp_path):
    # two types spike in the same hours -> co-exceedance 1.0
    counts = [1] * 20 + [50, 50]
    rows = []
    eid = 0
    for t in ["a", "b"]:
        for h, c in enumerate(counts):
            for _ in range(c):
                rows.append((eid, T0 + h * HOUR_US + eid, t))
                eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] for r in rows], dtype=np.int64).astype(
                    "datetime64[us]"
                )
            ),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_co_exceedance(str(tmp_path))
    r = out.iloc[0]
    assert {r["type_x"], r["type_y"]} == {"a", "b"}
    assert r["n_both"] == r["n_either"] == 2
    assert r["co_exceedance"] == 1.0
