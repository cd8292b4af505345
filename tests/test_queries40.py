"""Kernel tests for pipelines/queries40.py — value heatmap / revenue
median month / order dow mix known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries40 import (
    q_order_dow_mix,
    q_revenue_median_month,
    q_value_heatmap,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_value_heatmap(tmp_path):
    # hour 0: values 1, 3 (mean 2); hour 5: value 10
    ts = [T0, T0 + 1, T0 + 5 * HOUR_US]
    values = [1.0, 3.0, 10.0]
    tbl = pa.table(
        {
            "event_id": pa.array(range(3), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 3, pa.int64()),
            "event_type": pa.array(["buy"] * 3),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_value_heatmap(str(tmp_path)).set_index(["event_type", "hod"])
    assert out.loc[("buy", 0), "mean_value"] == 2.0
    assert out.loc[("buy", 5), "mean_value"] == 10.0


@pytest.mark.usefixtures("ray_session")
def test_revenue_median_month(tmp_path):
    # months Jan 100, Feb 100, Mar 200: total 400, half 200 -> Feb (cum 200)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [100.0, 100.0, 200.0],
            "o_orderdate": [D("1995-01-15"), D("1995-02-15"), D("1995-03-15")],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_revenue_median_month(str(tmp_path))
    r = out.iloc[0]
    assert r["n_months"] == 3
    assert r["median_month_us"] == int(np.datetime64("1995-02-01", "us").view(np.int64))
    assert r["cum_at_median_c"] == 20000 and r["total_c"] == 40000


@pytest.mark.usefixtures("ray_session")
def test_order_dow_mix(tmp_path):
    # 1995-01-01 was a Sunday (dow 0); 1995-01-02 Monday (dow 1)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(3, dtype=np.int64),
            "o_custkey": np.ones(3, dtype=np.int64),
            "o_orderstatus": ["O"] * 3,
            "o_totalprice": [1.0] * 3,
            "o_orderdate": [D("1995-01-01"), D("1995-01-01"), D("1995-01-02")],
            "o_orderpriority": ["1-URGENT"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_dow_mix(str(tmp_path)).set_index("dow")
    assert out.loc[0, "n_orders"] == 2  # Sunday
    assert out.loc[1, "n_orders"] == 1  # Monday
    assert out.loc[0, "share"] == round(2.0 / 3.0, 6)
