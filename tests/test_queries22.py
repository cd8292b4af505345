"""Kernel tests for pipelines/queries22.py — Yule K / Theil / peak
minutes / linecount histogram known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries22 import (
    q_linecount_histogram,
    q_peak_minutes,
    q_theil_index,
    q_yule_k,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
MINUTE_US = 60_000_000
D = lambda s: np.datetime64(s, "us")


def _events(values, users=None, minutes=None):
    n = len(values)
    ts = [T0 + (minutes[i] if minutes else 0) * MINUTE_US + i for i in range(n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "event_type": pa.array(["buy"] * n),
            "value": pa.array([float(v) for v in values], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_yule_k_known(tmp_path):
    # tokens: aa x3, bb x1 -> T=4, sum m^2 = 10, K = 1e4*(10-4)/16 = 3750
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["aa aa aa bb"],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([11], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_yule_k(str(tmp_path))
    r = out.iloc[0]
    assert r["n_tokens"] == 4 and r["vocab"] == 2
    assert r["yule_k"] == 3750.0


@pytest.mark.usefixtures("ray_session")
def test_theil_equal_is_zero(tmp_path):
    pq.write_table(
        _events([10.0] * 5, users=[1, 2, 3, 4, 5]), tmp_path / "events.parquet"
    )
    out = q_theil_index(str(tmp_path))
    r = out.iloc[0]
    assert r["n_users"] == 5
    assert r["theil"] == 0.0
    assert r["max_theil"] == round(math.log(5.0), 6)


@pytest.mark.usefixtures("ray_session")
def test_peak_minutes_ranked(tmp_path):
    # minute 3 has 5 events, minute 1 has 3, minute 0 has 1
    minutes = [3] * 5 + [1] * 3 + [0]
    pq.write_table(
        _events([1.0] * len(minutes), minutes=minutes), tmp_path / "events.parquet"
    )
    out = q_peak_minutes(str(tmp_path))
    assert out.iloc[0]["n_events"] == 5
    assert out.iloc[0]["minute_us"] == T0 + 3 * MINUTE_US
    assert out.iloc[1]["n_events"] == 3
    assert out.iloc[0]["rank"] == 1


@pytest.mark.usefixtures("ray_session")
def test_linecount_histogram(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 1, 1, 2, 3, 3], dtype=np.int64),
            "l_partkey": np.ones(6, dtype=np.int64),
            "l_suppkey": np.ones(6, dtype=np.int64),
            "l_linenumber": np.ones(6, dtype=np.int32),
            "l_quantity": [1.0] * 6,
            "l_extendedprice": [1.0] * 6,
            "l_discount": [0.0] * 6,
            "l_tax": [0.0] * 6,
            "l_returnflag": ["N"] * 6,
            "l_linestatus": ["O"] * 6,
            "l_shipdate": [D("1995-01-05")] * 6,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_linecount_histogram(str(tmp_path)).set_index("n_lines")
    assert out.loc[3, "n_orders"] == 1  # order 1
    assert out.loc[1, "n_orders"] == 1  # order 2
    assert out.loc[2, "n_orders"] == 1  # order 3
