"""Kernel tests for pipelines/queries31.py — acquisition curve /
supplier consistency / value band mix known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries31 import (
    q_supplier_consistency,
    q_user_acquisition,
    q_value_band_mix,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_user_acquisition_curve(tmp_path):
    # user 1 first on day 0, user 2 on day 0, user 3 on day 2
    rows = [(1, 0), (1, 2), (2, 0), (3, 2), (2, 1)]
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
    out = q_user_acquisition(str(tmp_path)).set_index("day_us")
    assert out.loc[T0, "new_users"] == 2
    assert out.loc[T0 + 2 * DAY_US, "new_users"] == 1
    assert out.loc[T0 + 2 * DAY_US, "cumulative_users"] == 3


@pytest.mark.usefixtures("ray_session")
def test_supplier_consistency_ranking(tmp_path):
    # supplier 1 lags {1, 9} (var 16); supplier 2 lags {5, 5} (var 0)
    li = pd.DataFrame(
        {
            "l_orderkey": np.array([1, 2, 3, 4], dtype=np.int64),
            "l_partkey": np.ones(4, dtype=np.int64),
            "l_suppkey": np.array([1, 1, 2, 2], dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [D("1995-01-02"), D("1995-01-10"),
                           D("1995-01-06"), D("1995-01-06")],
        }
    )
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2, 3, 4], dtype=np.int64),
            "o_custkey": np.ones(4, dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-01-01")] * 4,
            "o_orderpriority": ["1-URGENT"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_supplier_consistency(str(tmp_path))
    assert out.iloc[0]["suppkey"] == 1
    assert out.iloc[0]["var_lag"] == 16.0
    assert out.iloc[0]["mean_lag"] == 5.0
    assert out.iloc[1]["suppkey"] == 2 and out.iloc[1]["var_lag"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_value_band_mix(tmp_path):
    # values 1..8: quartiles 200/400/600 cents; 'buy' only in top band
    values = [float(i) for i in range(1, 9)]
    types = ["view"] * 6 + ["buy"] * 2
    ts = [T0 + i for i in range(8)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 8, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * 8),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_value_band_mix(str(tmp_path)).set_index(["band", "event_type"])
    assert out.loc[(4, "buy"), "n_events"] == 2
    assert out.loc[(4, "buy"), "band_share"] == 1.0
    assert out.loc[(1, "view"), "band_share"] == 1.0
