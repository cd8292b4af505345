"""Kernel tests for pipelines/queries47.py — new share / doc entropy /
order drought known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries47 import (
    q_daily_new_share,
    q_doc_entropy_mean,
    q_order_drought,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_daily_new_share(tmp_path):
    # day 0: users 1,2 (both new); day 1: users 1 (old), 3 (new)
    users = [1, 2, 1, 3]
    days = [0, 0, 1, 1]
    ts = [T0 + d * DAY_US + i for i, d in enumerate(days)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * 4),
            "value": pa.array([1.0] * 4, pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_daily_new_share(str(tmp_path)).set_index("day_us")
    assert out.loc[T0, "n_active"] == 2 and out.loc[T0, "n_new"] == 2
    assert out.loc[T0, "new_share"] == 1.0
    assert out.loc[T0 + DAY_US, "n_new"] == 1
    assert out.loc[T0 + DAY_US, "new_share"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_doc_entropy_mean(tmp_path):
    # doc 1: "aaaa" -> H 0; doc 2: "ab" -> H ln 2; mean ln2/2
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["aaaa", "ab"],
            "lang": ["en"] * 2,
            "source": ["web"] * 2,
            "n_chars": np.array([4, 2], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_doc_entropy_mean(str(tmp_path))
    r = out.iloc[0]
    assert r["n_docs"] == 2
    assert r["mean_entropy"] == round(math.log(2.0) / 2.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_order_drought(tmp_path):
    # orders on days 0, 1, 5 -> drought days 2,3,4 (len 3)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [1.0] * 3,
            "o_orderdate": [D("1995-01-01"), D("1995-01-02"), D("1995-01-06")],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_drought(str(tmp_path))
    r = out.iloc[0]
    assert r["n_days"] == 6
    assert r["n_orderless_days"] == 3
    assert r["max_drought_d"] == 3
