"""Kernel tests for pipelines/queries166.py — Huber mean, GEV shape."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_hourly(tmp_path, counts, event_type="click"):
    hours = pd.date_range("2024-01-01", periods=len(counts), freq="1h")
    ts = np.concatenate([np.repeat(h, c) for h, c in zip(hours, counts)])
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": pd.DatetimeIndex(ts),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": event_type,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_huber_resists_outlier(tmp_path):
    """Level-5 counts with one 100-spike: the Huber mean stays near 5
    while the plain mean is dragged to ~7.4."""
    from signalsharp_ray.pipelines.queries166 import q_huber_mean

    counts = np.array([4, 5, 6, 5, 4, 6, 5, 4, 6, 5] * 4 + [100])
    _write_hourly(tmp_path, counts)
    out = q_huber_mean(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["med"] == 5.0
    assert abs(r["huber_mean"] - 5.0) < 0.3
    assert r["huber_mean"] < counts.mean() - 1.0


@pytest.mark.usefixtures("ray_session")
def test_huber_constant_series_skipped(tmp_path):
    from signalsharp_ray.pipelines.queries166 import q_huber_mean

    counts = np.full(30, 3)
    # add a second non-constant type so the output keeps a schema
    hours = pd.date_range("2024-01-01", periods=30, freq="1h")
    ts, et = [], []
    for h, c in zip(hours, counts):
        ts.extend([h] * 3)
        et.extend(["const"] * 3)
        ts.extend([h] * int(2 + (len(ts) % 3)))
        et.extend(["vary"] * int(2 + (len(ts) % 3)))
    # simpler: rebuild vary counts deterministically
    ts, et = [], []
    vary = np.tile([2, 5, 3], 10)
    for h, c_const, c_vary in zip(hours, counts, vary):
        ts.extend([h] * int(c_const))
        et.extend(["const"] * int(c_const))
        ts.extend([h] * int(c_vary))
        et.extend(["vary"] * int(c_vary))
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": pd.DatetimeIndex(ts),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": et,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_huber_mean(str(tmp_path)).to_pandas()
    assert set(out["event_type"]) == {"vary"}


@pytest.mark.usefixtures("ray_session")
def test_gev_shape_matches_direct(tmp_path):
    """Daily maxima with a heavy upper tail: shape matches the direct
    PWM computation (and is negative — Frechet side)."""
    from signalsharp_ray.pipelines.queries166 import q_gev_shape_pwm

    rng = np.random.RandomState(8)
    base = rng.randint(2, 6, size=10 * 24)
    # inject escalating daily spikes (heavy tail of the maxima)
    for d in range(10):
        base[d * 24 + 12] = 10 + d * d
    _write_hourly(tmp_path, base)
    out = q_gev_shape_pwm(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_blocks"] == 10

    # direct replay
    daily_max = base.reshape(10, 24).max(axis=1)
    x = np.sort(daily_max).astype(float)
    n = 10
    i = np.arange(1, n + 1)
    b0 = x.mean()
    b1 = (((i - 1) / (n - 1)) * x).sum() / n
    b2 = ((((i - 1) * (i - 2)) / ((n - 1) * (n - 2))) * x).sum() / n
    c = (2 * b1 - b0) / (3 * b2 - b0) - np.log(2) / np.log(3)
    k = 7.8590 * c + 2.9554 * c * c
    assert r["shape_k"] == pytest.approx(k, abs=1e-5)
    assert r["shape_k"] < 0  # heavy-tailed maxima
