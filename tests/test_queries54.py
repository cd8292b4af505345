"""Kernel tests for pipelines/queries54.py — punctuation mix / order
value by dow / embedding compactness known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries54 import (
    q_embedding_compactness,
    q_order_value_by_dow,
    q_terminal_punct_mix,
)

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_terminal_punct_mix(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["Yes. No! Maybe? Sure."],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([21], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_terminal_punct_mix(str(tmp_path))
    r = out.iloc[0]
    assert r["n_period"] == 2 and r["n_bang"] == 1 and r["n_question"] == 1
    assert r["period_share"] == 0.5
    assert r["question_share"] == 0.25


@pytest.mark.usefixtures("ray_session")
def test_order_value_by_dow(tmp_path):
    # 1995-01-01 Sunday (dow 0) orders 10, 20; 1995-01-02 Monday 30
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [10.0, 20.0, 30.0],
            "o_orderdate": [D("1995-01-01"), D("1995-01-01"), D("1995-01-02")],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_value_by_dow(str(tmp_path)).set_index("dow")
    assert out.loc[0, "mean_value"] == 15.0
    assert out.loc[1, "mean_value"] == 30.0


@pytest.mark.usefixtures("ray_session")
def test_embedding_compactness(tmp_path):
    # two identical unit vectors -> quantized (127, 0); cross = 2 * 127^2
    vecs = [[1.0, 0.0], [1.0, 0.0]]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(2), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0, 0], pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = q_embedding_compactness(str(tmp_path))
    r = out.iloc[0]
    assert r["n_vecs"] == 2
    assert r["cross_sum"] == 2 * 127 * 127
    assert r["mean_pair_dot"] == float(127 * 127)
