"""Kernel tests for pipelines/queries165.py — Wasserstein distance and
seasonal Mann-Kendall."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, ts, et, value):
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": et,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.asarray(value, dtype=np.float64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_wasserstein_shifted_distributions(tmp_path):
    """Type b's values are type a's plus exactly 2.0: W1 = 2.0."""
    from signalsharp_ray.pipelines.queries165 import q_wasserstein_value_dist

    base = pd.Timestamp("2024-01-01")
    ts, et, val = [], [], []
    vals_a = [1.0, 2.0, 3.0, 4.0]
    for i, v in enumerate(vals_a * 5):  # 20 events, 'aaa' busier
        ts.append(base + pd.Timedelta(minutes=i))
        et.append("aaa")
        val.append(v)
    for i, v in enumerate(vals_a * 4):  # 16 events
        ts.append(base + pd.Timedelta(minutes=i))
        et.append("bbb")
        val.append(v + 2.0)
    _write(tmp_path, pd.DatetimeIndex(ts), et, val)
    out = q_wasserstein_value_dist(str(tmp_path))
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("aaa", "bbb")
    assert r["n_a"] == 20 and r["n_b"] == 16
    assert r["wasserstein"] == pytest.approx(2.0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_seasonal_mk_diurnal_cycle_is_null(tmp_path):
    """A pure repeating diurnal cycle: every season is constant across
    days -> S = 0, z = 0."""
    from signalsharp_ray.pipelines.queries165 import q_seasonal_mann_kendall

    ts = []
    for d in range(6):
        for h in range(24):
            c = 2 + (h % 4)  # same per-hod count every day
            for _ in range(c):
                ts.append(
                    pd.Timestamp("2024-01-01")
                    + pd.Timedelta(days=d, hours=h)
                )
    _write(
        tmp_path, pd.DatetimeIndex(ts), ["click"] * len(ts),
        np.ones(len(ts)),
    )
    out = q_seasonal_mann_kendall(str(tmp_path))
    r = out.iloc[0]
    assert r["s_stat"] == 0
    assert r["z"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_seasonal_mk_detects_drift(tmp_path):
    """Counts grow day over day at every hour: S is the maximum
    possible (every later day beats every earlier one in every
    season)."""
    from signalsharp_ray.pipelines.queries165 import q_seasonal_mann_kendall

    n_days, n_hours = 5, 6
    ts = []
    for d in range(n_days):
        for h in range(n_hours):
            for _ in range(2 + d):  # strictly increasing in d
                ts.append(
                    pd.Timestamp("2024-01-01")
                    + pd.Timedelta(days=d, hours=h)
                )
    _write(
        tmp_path, pd.DatetimeIndex(ts), ["click"] * len(ts),
        np.ones(len(ts)),
    )
    out = q_seasonal_mann_kendall(str(tmp_path))
    r = out.iloc[0]
    max_s = n_hours * (n_days * (n_days - 1) // 2)
    assert r["s_stat"] == max_s
    assert r["z"] > 2.0
