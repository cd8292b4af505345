"""Kernel tests for pipelines/queries123.py — histogram_quantile
interpolation and +Inf behavior, predict_linear on an exact ramp, WoW
pairing, and the seasonal-naive error on a perfectly periodic series."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, event_type, value):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": event_type,
            "value": np.asarray(value, dtype=np.float64),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_histogram_quantile_interpolates_inside_bucket(tmp_path):
    from signalsharp_ray.pipelines.queries123 import q_histogram_quantile

    # 10 events: 8 in bucket (<=50), 2 in (50,100]. rank = 9 -> second
    # bucket; est = 50 + 50 * (9 - 8)/2 = 75
    ts = ["2024-01-01 10:00:30"] * 10
    vals = [10.0] * 8 + [60.0, 70.0]
    _write_events(tmp_path, ts, "api", vals)
    out = q_histogram_quantile(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["p90_est"] == pytest.approx(75.0)


@pytest.mark.usefixtures("ray_session")
def test_histogram_quantile_inf_bucket_caps_at_highest_bound(tmp_path):
    from signalsharp_ray.pipelines.queries123 import q_histogram_quantile

    ts = ["2024-01-01 10:00:30"] * 5
    _write_events(tmp_path, ts, "api", [900.0] * 5)  # everything in +Inf
    out = q_histogram_quantile(str(tmp_path))
    assert out.iloc[0]["p90_est"] == pytest.approx(400.0)


@pytest.mark.usefixtures("ray_session")
def test_predict_linear_exact_on_ramp(tmp_path):
    from signalsharp_ray.pipelines.queries123 import q_predict_linear

    # hourly counts 1,2,3,...,12 -> slope 1, prediction = count at
    # i = w-1+24 = 35 -> intercept 1 + 35 = 36
    ts = []
    for h in range(12):
        ts += [f"2024-01-01 {h:02d}:00:30"] * (h + 1)
    _write_events(tmp_path, ts, "ramp", np.ones(len(ts)))
    out = q_predict_linear(str(tmp_path))
    r = out.iloc[0]
    assert r["n_window"] == 12
    assert r["slope"] == pytest.approx(1.0)
    assert r["predicted"] == pytest.approx(36.0)


@pytest.mark.usefixtures("ray_session")
def test_week_over_week_pairs_days(tmp_path):
    from signalsharp_ray.pipelines.queries123 import q_week_over_week_daily

    ts = []
    for d in range(14):
        n = 2 if d < 7 else 6
        ts += [f"2024-01-{d + 1:02d} 12:00:00"] * n
    _write_events(tmp_path, ts, "load", np.ones(len(ts)))
    out = q_week_over_week_daily(str(tmp_path))
    assert len(out) == 7  # days 7..13 each have a prior week
    assert (out["n_today"] == 6).all()
    assert (out["n_lastweek"] == 2).all()
    assert np.allclose(out["wow_ratio"].to_numpy(), 3.0)


@pytest.mark.usefixtures("ray_session")
def test_seasonal_naive_wins_on_periodic_series(tmp_path):
    from signalsharp_ray.pipelines.queries123 import q_seasonal_naive_error

    # perfectly 24h-periodic: seasonal-naive error 0, naive error > 0
    ts = []
    for d in range(3):
        for h in range(24):
            n = 5 if h == 12 else 1
            ts += [f"2024-01-{d + 1:02d} {h:02d}:00:30"] * n
    _write_events(tmp_path, ts, "diurnal", np.ones(len(ts)))
    out = q_seasonal_naive_error(str(tmp_path))
    r = out.iloc[0]
    assert r["sae_seasonal"] == 0
    assert r["sae_naive"] > 0
    assert r["error_ratio"] == 0.0
