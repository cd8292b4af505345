"""Kernel tests for pipelines/queries14.py — turning points / runs test /
Allan variance / Hurst known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries14 import (
    q_allan_variance,
    q_hurst_rs,
    q_runs_test,
    q_turning_points,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000


def _events_by_hour(counts, event_type="view"):
    """counts[i] events in hour i."""
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    n = len(hours)
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array([event_type] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_turning_points_known(tmp_path):
    # counts per hour: 1,3,2,4,1 -> interior 3(peak), 2(valley), 4(peak)
    pq.write_table(_events_by_hour([1, 3, 2, 4, 1]), tmp_path / "events.parquet")
    out = q_turning_points(str(tmp_path))
    r = out.iloc[0]
    assert r["n_hours"] == 5
    assert r["n_turning"] == 3
    assert r["expected"] == 2.0  # 2*(5-2)/3


@pytest.mark.usefixtures("ray_session")
def test_runs_test_known(tmp_path):
    # counts 5,5,1,1,5: mean=3.4 -> above T,T,F,F,T -> 3 runs, n1=3
    pq.write_table(_events_by_hour([5, 5, 1, 1, 5]), tmp_path / "events.parquet")
    out = q_runs_test(str(tmp_path))
    r = out.iloc[0]
    assert r["n_above"] == 3
    assert r["n_runs"] == 3
    assert r["expected"] == round(2.0 * 3 * 2 / 5 + 1.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_allan_variance_ramp(tmp_path):
    # counts 1,2,3,4: tau=1 -> diffs 1,1,1, num=3, avar=3/(2*3)=0.5
    #                 tau=2 -> bins 3,7 -> num=16, avar=16/(2*1*4)=2.0
    pq.write_table(_events_by_hour([1, 2, 3, 4]), tmp_path / "events.parquet")
    out = q_allan_variance(str(tmp_path)).set_index("tau_hours")
    assert out.loc[1, "sq_sum"] == 3
    assert out.loc[1, "avar"] == 0.5
    assert out.loc[2, "sq_sum"] == 16
    assert out.loc[2, "avar"] == 2.0
    assert 4 not in out.index  # only 1 full 4h bin -> excluded


@pytest.mark.usefixtures("ray_session")
def test_hurst_alternating_antipersistent(tmp_path):
    # strongly alternating series -> anti-persistent, H well below 0.5
    counts = [5 if i % 2 == 0 else 1 for i in range(192)]
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_hurst_rs(str(tmp_path))
    assert set(out["window_h"]) == {24, 48, 96}
    h = out["hurst"].iloc[0]
    assert (out["hurst"] == h).all()
    assert h < 0.3


@pytest.mark.usefixtures("ray_session")
def test_hurst_trending_persistent(tmp_path):
    # monotone ramp -> strongly persistent, H near 1
    counts = [1 + i // 4 for i in range(192)]
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_hurst_rs(str(tmp_path))
    assert out["hurst"].iloc[0] > 0.8
