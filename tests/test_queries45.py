"""Kernel tests for pipelines/queries45.py — value halves drift /
supplier top-part share known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries45 import (
    q_supplier_top_part_share,
    q_value_halves_drift,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_value_halves_drift(tmp_path):
    # window [0h, 10h], mid 5h: first-half values 1,3 (mean 2);
    # second-half values 10, 20 (mean 15) -> shift 13
    hours = [0, 1, 6, 10]
    values = [1.0, 3.0, 10.0, 20.0]
    ts = [T0 + h * HOUR_US for h in hours]
    tbl = pa.table(
        {
            "event_id": pa.array(range(4), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 4, pa.int64()),
            "event_type": pa.array(["buy"] * 4),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * 4),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_value_halves_drift(str(tmp_path))
    r = out.iloc[0]
    assert r["n_first"] == 2 and r["n_second"] == 2
    assert r["mean_first"] == 2.0
    assert r["mean_second"] == 15.0
    assert r["mean_shift"] == 13.0


@pytest.mark.usefixtures("ray_session")
def test_supplier_top_part_share(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(4, dtype=np.int64),
            "l_partkey": np.array([10, 11, 10, 12], dtype=np.int64),
            "l_suppkey": np.array([1, 1, 1, 2], dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [60.0, 40.0, 20.0, 50.0],
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["N"] * 4,
            "l_linestatus": ["O"] * 4,
            "l_shipdate": [D("1995-01-05")] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_supplier_top_part_share(str(tmp_path))
    # supplier 1 revenue 120, top part 10 at 80 -> share 2/3
    r = out.iloc[0]
    assert r["suppkey"] == 1
    assert r["revenue"] == 120.0
    assert r["top_partkey"] == 10
    assert r["top_part_share"] == round(80.0 / 120.0, 6)
    assert out.iloc[1]["suppkey"] == 2
    assert out.iloc[1]["top_part_share"] == 1.0
