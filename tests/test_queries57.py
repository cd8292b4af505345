"""Kernel tests for pipelines/queries57.py — monthly CV / type audience /
label balance known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries57 import (
    q_label_balance,
    q_monthly_order_cv,
    q_type_audience,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_monthly_order_cv_constant(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.ones(4, dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-01-05"), D("1995-01-20"),
                            D("1995-02-05"), D("1995-02-20")],
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_monthly_order_cv(str(tmp_path))
    r = out.iloc[0]
    assert r["n_months"] == 2
    assert r["mean_monthly"] == 2.0
    assert r["cv"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_type_audience(tmp_path):
    types = ["a", "a", "b"]
    users = [1, 2, 1]
    ts = [T0 + i for i in range(3)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(3), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array([1.0] * 3, pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_type_audience(str(tmp_path)).set_index("event_type")
    assert out.loc["a", "n_users"] == 2 and out.loc["a", "reach"] == 1.0
    assert out.loc["b", "n_users"] == 1 and out.loc["b", "reach"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_label_balance_uniform(tmp_path):
    vecs = [[1.0, 0.0]] * 4
    labels = [0, 0, 1, 1]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = q_label_balance(str(tmp_path))
    r = out.iloc[0]
    assert r["n_vecs"] == 4 and r["n_labels"] == 2
    assert r["entropy"] == round(math.log(2.0), 6)
    assert r["entropy"] == r["max_entropy"]
