"""Kernel tests for pipelines/queries39.py — daily peak hour / Fano
factor / status matrix known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries39 import (
    q_daily_peak_hour,
    q_fano_factor,
    q_status_flag_matrix,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


def _events(day_hour_counts):
    """day_hour_counts: list of (day, hour, count)."""
    rows = []
    eid = 0
    for d, h, c in day_hour_counts:
        for _ in range(c):
            rows.append(T0 + d * DAY_US + h * HOUR_US + eid)
            eid += 1
    return pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(np.array(rows, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_daily_peak_hour(tmp_path):
    # day 0 peaks at hour 9, day 1 peaks at hour 9, day 2 at hour 14
    spec = [(0, 9, 5), (0, 3, 1), (1, 9, 4), (1, 20, 2), (2, 14, 3), (2, 9, 1)]
    pq.write_table(_events(spec), tmp_path / "events.parquet")
    out = q_daily_peak_hour(str(tmp_path)).set_index("peak_hod")
    assert out.loc[9, "n_days"] == 2
    assert out.loc[14, "n_days"] == 1


@pytest.mark.usefixtures("ray_session")
def test_fano_factor_poisson_vs_constant(tmp_path):
    # constant hourly load -> var 0 -> fano 0 at every window size
    spec = [(0, h, 5) for h in range(24)] + [(1, h, 5) for h in range(24)]
    pq.write_table(_events(spec), tmp_path / "events.parquet")
    out = q_fano_factor(str(tmp_path)).set_index("window_h")
    assert out.loc[1, "fano"] == 0.0
    assert out.loc[6, "fano"] == 0.0
    assert out.loc[24, "mean_count"] == 120.0


@pytest.mark.usefixtures("ray_session")
def test_status_flag_matrix(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(4, dtype=np.int64),
            "l_partkey": np.ones(4, dtype=np.int64),
            "l_suppkey": np.ones(4, dtype=np.int64),
            "l_linenumber": np.ones(4, dtype=np.int32),
            "l_quantity": [1.0] * 4,
            "l_extendedprice": [1.0] * 4,
            "l_discount": [0.0] * 4,
            "l_tax": [0.0] * 4,
            "l_returnflag": ["R", "N", "N", "A"],
            "l_linestatus": ["F", "O", "O", "F"],
            "l_shipdate": [D("1995-01-05")] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    out = q_status_flag_matrix(str(tmp_path)).set_index(["returnflag", "linestatus"])
    assert out.loc[("N", "O"), "n_items"] == 2
    assert out.loc[("N", "O"), "share"] == 0.5
    assert out.loc[("R", "F"), "share"] == 0.25
