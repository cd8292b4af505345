"""Kernel tests for pipelines/queries38.py — tax summary / peak spacing /
returns by type known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries38 import (
    q_peak_spacing,
    q_returns_by_part_type,
    q_tax_summary_monthly,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_tax_summary_monthly(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(2, dtype=np.int64),
            "l_partkey": np.ones(2, dtype=np.int64),
            "l_suppkey": np.ones(2, dtype=np.int64),
            "l_linenumber": np.ones(2, dtype=np.int32),
            "l_quantity": [1.0] * 2,
            "l_extendedprice": [100.0, 200.0],
            "l_discount": [0.0] * 2,
            "l_tax": [0.05, 0.10],
            "l_returnflag": ["N"] * 2,
            "l_linestatus": ["O"] * 2,
            "l_shipdate": [D("1995-01-05"), D("1995-01-06")],
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_tax_summary_monthly(str(tmp_path))
    r = out.iloc[0]
    assert r["n_items"] == 2
    assert r["taxable_c"] == 30000
    assert r["tax_collected"] == 25.0  # 5 + 20 dollars
    assert r["effective_rate"] == round(25.0 / 300.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_peak_spacing_periodic(tmp_path):
    # spikes every 12 hours over 48 hours: positions 0, 12, 24, 36
    counts = [100 if h % 12 == 0 else 5 for h in range(48)]
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
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
    out = q_peak_spacing(str(tmp_path))
    r = out.iloc[0]
    assert r["n_peaks"] == 4
    assert r["n_gaps"] == 3
    assert r["mean_gap_h"] == 12.0
    assert r["max_gap_h"] == 12


@pytest.mark.usefixtures("ray_session")
def test_returns_by_part_type(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(4, dtype=np.int64),
            "l_partkey": np.array([10, 10, 11, 11], dtype=np.int64),
            "l_suppkey": np.ones(4, dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["R", "N", "N", "N"],
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [D("1995-01-05")] * 4,
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.array([10, 11], dtype=np.int64),
            "p_name": ["a", "b"],
            "p_brand": ["B"] * 2,
            "p_type": ["STEEL", "BRASS"],
            "p_size": np.array([1, 1], dtype=np.int32),
            "p_retailprice": [1.0] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(part), tmp_path / "part.parquet")
    out = q_returns_by_part_type(str(tmp_path)).set_index("p_type")
    assert out.loc["STEEL", "return_rate"] == 0.5
    assert out.loc["BRASS", "return_rate"] == 0.0
