"""Kernel tests for pipelines/queries44.py — trigram uniqueness /
first-vs-repeat / breadth histogram known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries44 import (
    q_first_vs_repeat_value,
    q_trigram_uniqueness,
    q_user_breadth_histogram,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_trigram_uniqueness(tmp_path):
    # web: "abcd" -> {abc, bcd}; wiki: "bcde" -> {bcd, cde}
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["abcd", "bcde"],
            "lang": ["en"] * 2,
            "source": ["web", "wiki"],
            "n_chars": np.array([4, 4], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_trigram_uniqueness(str(tmp_path)).set_index("source")
    assert out.loc["web", "n_trigrams"] == 2
    assert out.loc["web", "n_unique"] == 1  # abc unique, bcd shared
    assert out.loc["web", "uniqueness"] == 0.5
    assert out.loc["wiki", "uniqueness"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_first_vs_repeat_value(tmp_path):
    # cust 1: first 10, repeats 20, 30; cust 2: first 40 (no repeat)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [10.0, 20.0, 30.0, 40.0],
            "o_orderdate": [D("1995-01-01"), D("1995-02-01"),
                            D("1995-03-01"), D("1995-01-05")],
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_first_vs_repeat_value(str(tmp_path))
    r = out.iloc[0]
    assert r["n_first"] == 2 and r["n_repeat"] == 2
    assert r["mean_first"] == 25.0  # (10+40)/2
    assert r["mean_repeat"] == 25.0  # (20+30)/2
    assert r["repeat_premium"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_user_breadth_histogram(tmp_path):
    types = ["a", "b", "a", "a"]
    users = [1, 1, 1, 2]
    ts = [T0 + i for i in range(4)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array([1.0] * 4, pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_user_breadth_histogram(str(tmp_path)).set_index("n_types")
    assert out.loc[2, "n_users"] == 1  # user 1 touches a, b
    assert out.loc[1, "n_users"] == 1  # user 2 touches a
