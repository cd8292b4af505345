"""Known-answer tests for pipelines/queries8.py over a tiny synthetic
events.parquet (exact hourly counts by construction)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries8 import (
    q_busy_runs,
    q_hourly_peaks,
    q_momentum_runs,
    q_seasonal_strength,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000  # epoch us


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    """click hourly counts: [1, 3, 1, 2, 2, 0, 4]; values = 10.00 each."""
    counts = [1, 3, 1, 2, 2, 0, 4]
    ts, vals = [], []
    for h, n in enumerate(counts):
        for k in range(n):
            ts.append(T0 + h * HOUR_US + k * 60_000_000)
            vals.append(10.0)
    n = len(ts)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(
                np.array(ts, dtype=np.int64).astype("datetime64[us]")
            ),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    d = tmp_path_factory.mktemp("q8")
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_hourly_peaks_known(sf_dir):
    out = q_hourly_peaks(sf_dir)
    # series 1,3,1,2,2,0,4: strict interior peaks -> hour 1 (3 > 1, > 1)
    assert list(out["hour_us"]) == [T0 + 1 * HOUR_US]
    assert list(out["n"]) == [3]


@pytest.mark.usefixtures("ray_session")
def test_busy_runs_known(sf_dir):
    out = q_busy_runs(sf_dir).sort_values("start_us").reset_index(drop=True)
    # hours with n >= 2: h1 (3), h3 (2), h4 (2), h6 (4) -> runs {1}, {3,4}, {6}
    assert list(out["start_us"]) == [T0 + HOUR_US, T0 + 3 * HOUR_US, T0 + 6 * HOUR_US]
    assert list(out["n_hours"]) == [1, 2, 1]
    assert list(out["total"]) == [3, 4, 4]


@pytest.mark.usefixtures("ray_session")
def test_momentum_runs_known(sf_dir):
    out = q_momentum_runs(sf_dir)
    # diffs over 1,3,1,2,2,0,4: +,-,+,0,-,+ -> 3 up, 2 down, 1 flat, longest 1
    r = out.iloc[0]
    assert (r["n_up"], r["n_down"], r["n_flat"], r["longest_up_run"]) == (3, 2, 1, 1)


@pytest.mark.usefixtures("ray_session")
def test_seasonal_strength_constant_values_filtered(sf_dir):
    # all values identical -> total SS == 0 -> type omitted on both engines
    out = q_seasonal_strength(sf_dir)
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_seasonal_strength_perfect_profile(tmp_path):
    # two days, values depend ONLY on hour-of-day -> strength == 1.0
    ts, vals = [], []
    for day in range(2):
        for h in range(4):
            for k in range(2):
                ts.append(T0 + (day * 24 + h) * HOUR_US + k * 60_000_000)
                vals.append(float(10 * (h + 1)))
    n = len(ts)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_seasonal_strength(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["strength"] == 1.0
