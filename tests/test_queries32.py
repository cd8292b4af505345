"""Kernel tests for pipelines/queries32.py — month seasonality /
discount curve / lifetime histogram known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries32 import (
    q_discount_by_quantity,
    q_order_month_seasonality,
    q_user_lifetime_histogram,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_order_month_seasonality_uniform(tmp_path):
    # one order per month -> share 1/12 each, chi2 = 0
    dates = [D(f"1995-{m:02d}-15") for m in range(1, 13)]
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(12, dtype=np.int64),
            "o_custkey": np.ones(12, dtype=np.int64),
            "o_orderstatus": ["O"] * 12,
            "o_totalprice": [1.0] * 12,
            "o_orderdate": dates,
            "o_orderpriority": ["1-URGENT"] * 12,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_order_month_seasonality(str(tmp_path))
    assert len(out) == 12
    assert (out["n_orders"] == 1).all()
    assert out.iloc[0]["chi2"] == 0.0
    assert out.iloc[0]["share"] == round(1.0 / 12.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_discount_by_quantity(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0, 10.0, 10.0],
            "l_extendedprice": [1.0] * 3,
            "l_discount": [0.00, 0.05, 0.10],
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_discount_by_quantity(str(tmp_path)).set_index("qty")
    assert out.loc[1, "mean_discount_bp"] == 0.0
    assert out.loc[10, "n_items"] == 2
    assert out.loc[10, "mean_discount_bp"] == 750.0  # (500+1000)/2


@pytest.mark.usefixtures("ray_session")
def test_user_lifetime_histogram(tmp_path):
    # user 1 spans 3 days; users 2, 3 are single-visit (0 days)
    rows = [(1, 0), (1, 3), (2, 1), (3, 5)]
    ts = [T0 + d * DAY_US + i for i, (_, d) in enumerate(rows)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_user_lifetime_histogram(str(tmp_path)).set_index("lifetime_d")
    assert out.loc[0, "n_users"] == 2
    assert out.loc[3, "n_users"] == 1  # user 1 spans 3 full days
