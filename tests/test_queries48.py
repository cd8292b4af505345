"""Kernel tests for pipelines/queries48.py — qty-price corr / peak day /
question share known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries48 import (
    q_peak_day,
    q_qty_price_corr,
    q_question_doc_share,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_qty_price_corr_negative(tmp_path):
    # bigger quantity -> cheaper unit price, perfect negative corr
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0, 2.0, 3.0],
            "l_extendedprice": [30.0, 40.0, 30.0],  # unit: 30, 20, 10
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_qty_price_corr(str(tmp_path))
    r = out.iloc[0]
    assert r["n_items"] == 3
    assert r["corr"] == -1.0


@pytest.mark.usefixtures("ray_session")
def test_peak_day(tmp_path):
    # days 0,1,2 with 1,1,4 events -> peak day 2, share 4/6
    days = [0, 1, 2, 2, 2, 2]
    ts = [T0 + d * DAY_US + i for i, d in enumerate(days)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(6), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 6, pa.int64()),
            "event_type": pa.array(["view"] * 6),
            "value": pa.array([1.0] * 6, pa.float64()),
            "props": pa.array(["{}"] * 6),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_peak_day(str(tmp_path))
    r = out.iloc[0]
    assert r["peak_day_us"] == T0 + 2 * DAY_US
    assert r["n_events"] == 4
    assert r["share"] == round(4.0 / 6.0, 6)
    assert r["zscore"] > 1


@pytest.mark.usefixtures("ray_session")
def test_question_doc_share(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": ["what is this?", "statement.", "really?  "],
            "lang": ["en"] * 3,
            "source": ["web"] * 3,
            "n_chars": np.array([13, 10, 9], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_question_doc_share(str(tmp_path))
    r = out.iloc[0]
    assert r["n_docs"] == 3
    assert r["n_question"] == 2
    assert r["question_share"] == round(2.0 / 3.0, 6)
