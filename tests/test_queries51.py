"""Kernel tests for pipelines/queries51.py — yearly acquisition /
diurnal amplitude / lead-time histogram known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries51 import (
    q_customer_acquisition_yearly,
    q_diurnal_amplitude,
    q_lead_time_histogram,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_customer_acquisition_yearly(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.array([1, 1, 2, 3], dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-06-01"), D("1996-01-01"),
                            D("1995-08-01"), D("1996-02-01")],
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_customer_acquisition_yearly(str(tmp_path)).set_index("year")
    assert out.loc[1995, "new_customers"] == 2  # cust 1, 2
    assert out.loc[1996, "new_customers"] == 1  # cust 3
    assert out.loc[1996, "cumulative_customers"] == 3


@pytest.mark.usefixtures("ray_session")
def test_diurnal_amplitude(tmp_path):
    # all 24 hours present on 1 day; hour 9 has 10 events, others 1
    rows = []
    eid = 0
    for h in range(24):
        for _ in range(10 if h == 9 else 1):
            rows.append(T0 + h * HOUR_US + eid)
            eid += 1
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(np.array(rows, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_diurnal_amplitude(str(tmp_path))
    r = out.iloc[0]
    assert r["peak_hod"] == 9 and r["peak_mean"] == 10.0
    assert r["trough_hod"] == 0 and r["trough_mean"] == 1.0
    assert r["amplitude_ratio"] == 10.0


@pytest.mark.usefixtures("ray_session")
def test_lead_time_histogram_with_negative_lead(tmp_path):
    # order 1 ships day +10 (week 1); order 2 ships day -8 (week -2,
    # floor(-8/7) = -2) — exercises the negative floor-division path
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 2], dtype=np.int64),
            "l_partkey": np.ones(2, dtype=np.int64),
            "l_suppkey": np.ones(2, dtype=np.int64),
            "l_linenumber": np.ones(2, dtype=np.int32),
            "l_quantity": [1.0] * 2,
            "l_extendedprice": [1.0] * 2,
            "l_discount": [0.0] * 2,
            "l_tax": [0.0] * 2,
            "l_shipdate": [D("1995-01-11"), D("1994-12-24")],
            "l_returnflag": ["N"] * 2,
            "l_linestatus": ["O"] * 2,
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.ones(2, dtype=np.int64),
            "o_orderstatus": ["O"] * 2,
            "o_totalprice": [1.0] * 2,
            "o_orderdate": [D("1995-01-01"), D("1995-01-01")],
            "o_orderpriority": ["1-URGENT"] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_lead_time_histogram(str(tmp_path)).set_index("lead_weeks")
    assert out.loc[1, "n_orders"] == 1
    assert out.loc[-2, "n_orders"] == 1  # floor(-8 / 7) = -2
