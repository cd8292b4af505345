"""Kernel tests for pipelines/queries42.py — lang purity / weekly slot /
price dispersion known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries42 import (
    q_lang_purity,
    q_part_price_dispersion,
    q_peak_week_slot,
)

T0 = pd.Timestamp("2024-01-01").value // 1000  # a Monday
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_lang_purity(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["x"] * 4,
            "lang": ["en", "en", "de", "en"],
            "source": ["web"] * 4,
            "n_chars": np.ones(4, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_lang_purity(str(tmp_path))
    r = out.iloc[0]
    assert r["major_lang"] == "en"
    assert r["n_major"] == 3 and r["n_docs"] == 4
    assert r["purity"] == 0.75


@pytest.mark.usefixtures("ray_session")
def test_peak_week_slot(tmp_path):
    # Monday (dow=1) hour 9 loaded twice with 10 events; rest 1 event
    ts = []
    for wk in range(2):  # two Mondays
        base = T0 + wk * 7 * DAY_US + 9 * HOUR_US
        ts.extend(base + i for i in range(10))
    ts.append(T0 + 2 * HOUR_US)  # Monday hour 2, once
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "event_type": pa.array(["view"] * len(ts)),
            "value": pa.array([1.0] * len(ts), pa.float64()),
            "props": pa.array(["{}"] * len(ts)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_peak_week_slot(str(tmp_path))
    r = out.iloc[0]
    assert r["dow"] == 1 and r["hod"] == 9  # 2024-01-01 is a Monday
    assert r["n_occurrences"] == 2 and r["total_events"] == 20
    assert r["mean_load"] == 10.0


@pytest.mark.usefixtures("ray_session")
def test_part_price_dispersion(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(4, dtype=np.int64),
            "l_partkey": np.array([10, 10, 11, 11], dtype=np.int64),
            "l_suppkey": np.ones(4, dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [1.0, 2.0, 1.0, 1.0],
            "l_extendedprice": [10.0, 30.0, 5.0, 5.5],
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [D("1995-01-05")] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_part_price_dispersion(str(tmp_path))
    # part 10 unit prices: 10.00, 15.00 -> range 500; part 11: 5.00, 5.50 -> 50
    assert out.iloc[0]["partkey"] == 10
    assert out.iloc[0]["range_c"] == 500
    assert out.iloc[1]["partkey"] == 11
    assert out.iloc[1]["range_c"] == 50
