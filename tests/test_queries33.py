"""Kernel tests for pipelines/queries33.py — transition latency / word
length stats / supplier degree known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries33 import (
    q_supplier_degree_histogram,
    q_transition_latency,
    q_word_length_stats,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_transition_latency(tmp_path):
    # user 1: a -(10us)-> b -(30us)-> a ; so a->b mean 10, b->a mean 30
    ts = [T0, T0 + 10, T0 + 40]
    types = ["a", "b", "a"]
    tbl = pa.table(
        {
            "event_id": pa.array(range(3), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1, 1, 1], pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_transition_latency(str(tmp_path)).set_index(["from_type", "to_type"])
    assert out.loc[("a", "b"), "mean_gap_us"] == 10.0
    assert out.loc[("b", "a"), "mean_gap_us"] == 30.0
    assert out.loc[("a", "b"), "n_transitions"] == 1


@pytest.mark.usefixtures("ray_session")
def test_word_length_stats(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["cat elephants go"],  # lens 3, 9, 2
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([16], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_word_length_stats(str(tmp_path))
    r = out.iloc[0]
    assert r["n_tokens"] == 3
    assert r["mean_len"] == round(14.0 / 3.0, 6)
    assert r["n_long"] == 1  # elephants
    assert r["long_share"] == round(1.0 / 3.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_supplier_degree_histogram(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(5, dtype=np.int64),
            "l_partkey": np.array([10, 11, 10, 12, 12], dtype=np.int64),
            "l_suppkey": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "l_linenumber": np.ones(5, dtype=np.int32),
            "l_quantity": [1.0] * 5,
            "l_extendedprice": [1.0] * 5,
            "l_discount": [0.0] * 5,
            "l_tax": [0.0] * 5,
            "l_returnflag": ["N"] * 5,
            "l_linestatus": ["O"] * 5,
            "l_shipdate": [D("1995-01-05")] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_supplier_degree_histogram(str(tmp_path)).set_index("n_parts")
    # supplier 1 ships parts {10, 11} -> 2; supplier 2 ships {12} -> 1
    assert out.loc[2, "n_suppliers"] == 1
    assert out.loc[1, "n_suppliers"] == 1
