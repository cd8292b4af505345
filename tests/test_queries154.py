"""Kernel tests for pipelines/queries154.py — Hurst, EWMA chart,
Croston, theta forecast on constructed events tables."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, value, event_type="click"):
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": event_type,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.asarray(value, dtype=np.float64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_hurst_alternating_series(tmp_path):
    """Alternating hourly counts [1,2,1,2,...]: aggregation at any even
    m kills all variance except m=1... actually m=2 block means are all
    1.5 (zero variance) -> the query must SKIP the group, exactly as the
    oracle's HAVING MIN(var) > 0 does."""
    from signalsharp_ray.pipelines.queries154 import q_hurst_exponent

    hours = pd.date_range("2024-01-01", periods=64, freq="1h")
    ts = np.concatenate(
        [np.repeat(h, 1 + (i % 2)) for i, h in enumerate(hours)]
    )
    _write_events(tmp_path, pd.DatetimeIndex(ts), np.ones(len(ts)))
    out = q_hurst_exponent(str(tmp_path)).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_hurst_noisy_series_matches_direct(tmp_path):
    """Deterministic pseudo-noise counts: H computed by an independent
    numpy implementation matches the pipeline."""
    from signalsharp_ray.pipelines.queries154 import q_hurst_exponent

    rng = np.random.RandomState(7)
    counts = rng.randint(1, 6, size=96)
    hours = pd.date_range("2024-01-01", periods=96, freq="1h")
    ts = np.concatenate([np.repeat(h, c) for h, c in zip(hours, counts)])
    _write_events(tmp_path, pd.DatetimeIndex(ts), np.ones(len(ts)))

    xs, ys = [], []
    for m in (1, 2, 4, 8, 16):
        k = 96 // m
        means = counts[: k * m].reshape(k, m).mean(axis=1)
        var = means.var()
        xs.append(math.log(m))
        ys.append(math.log(var))
    slope = np.polyfit(xs, ys, 1)[0]
    expected = 1.0 + slope / 2.0

    out = q_hurst_exponent(str(tmp_path)).to_pandas()
    assert len(out) == 1
    assert out["hurst"].iloc[0] == pytest.approx(expected, abs=1e-5)


@pytest.mark.usefixtures("ray_session")
def test_ewma_chart_flags_spike(tmp_path):
    """A flat series with one large spike: the chart flags the spike
    hour (and the EWMA recursion matches a direct loop)."""
    from signalsharp_ray.pipelines.queries154 import q_ewma_chart

    counts = np.array([2] * 30 + [20] + [2] * 9)
    hours = pd.date_range("2024-01-01", periods=40, freq="1h")
    ts = np.concatenate([np.repeat(h, c) for h, c in zip(hours, counts)])
    _write_events(tmp_path, pd.DatetimeIndex(ts), np.ones(len(ts)))

    out = (
        q_ewma_chart(str(tmp_path))
        .to_pandas()
        .sort_values("idx")
        .reset_index(drop=True)
    )
    assert len(out) == 40
    v = counts.astype(float)
    mu = v.mean()
    sigma = v.std()
    z = mu
    zs = []
    for t in range(40):
        z = 0.2 * v[t] + 0.8 * z
        zs.append(z)
    np.testing.assert_allclose(out["ewma"].to_numpy(), zs, atol=1e-6)
    flagged = out.loc[out["out_of_control"] == 1, "idx"].tolist()
    assert 30 in flagged  # the spike hour
    assert 0 not in flagged
    # limits widen monotonically toward the asymptote
    ucl = out["ucl"].to_numpy()
    assert np.all(np.diff(ucl) >= -1e-12)
    assert ucl[-1] == pytest.approx(
        mu + 3 * sigma * math.sqrt(0.2 / 1.8), abs=1e-4
    )


@pytest.mark.usefixtures("ray_session")
def test_croston_known_demands(tmp_path):
    """day1: non-qualifying only; day2: demand 2; day5: demand 1.
    z = 2 + 0.1(1-2) = 1.9, p = 2 + 0.1((5-2)-2) = 2.1."""
    from signalsharp_ray.pipelines.queries154 import q_croston_forecast

    ts = pd.to_datetime(
        [
            "2024-01-01 10:00",  # value 5   (non-qualifying, pins day0)
            "2024-01-02 09:00",  # value 200 (demand)
            "2024-01-02 11:00",  # value 200 (demand)
            "2024-01-05 08:00",  # value 300 (demand)
        ]
    )
    _write_events(tmp_path, ts, [5.0, 200.0, 200.0, 300.0])
    out = q_croston_forecast(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_demands"] == 2
    assert r["croston"] == pytest.approx(1.9 / 2.1, abs=1e-6)
    assert r["sba"] == pytest.approx(0.95 * 1.9 / 2.1, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_croston_skips_type_without_demand(tmp_path):
    from signalsharp_ray.pipelines.queries154 import q_croston_forecast

    ts = pd.to_datetime(["2024-01-01 10:00", "2024-01-02 10:00"])
    _write_events(tmp_path, ts, [5.0, 7.0])
    out = q_croston_forecast(str(tmp_path))
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_theta_constant_series_is_flat(tmp_path):
    """Constant daily counts c: trend is flat at c, theta line is c,
    SES level is c -> every forecast is exactly c."""
    from signalsharp_ray.pipelines.queries154 import q_theta_forecast

    days = pd.date_range("2024-01-01", periods=6, freq="1D")
    ts = np.concatenate([np.repeat(d, 3) for d in days])
    _write_events(tmp_path, pd.DatetimeIndex(ts), np.ones(len(ts)))
    out = q_theta_forecast(str(tmp_path)).to_pandas()
    assert len(out) == 3
    np.testing.assert_allclose(out["forecast"].to_numpy(), 3.0, atol=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_theta_linear_series_matches_direct(tmp_path):
    """Daily counts 1..6: replay the definition directly."""
    from signalsharp_ray.pipelines.queries154 import q_theta_forecast

    days = pd.date_range("2024-01-01", periods=6, freq="1D")
    counts = np.arange(1, 7)
    ts = np.concatenate([np.repeat(d, c) for d, c in zip(days, counts)])
    _write_events(tmp_path, pd.DatetimeIndex(ts), np.ones(len(ts)))

    v = counts.astype(float)
    n = 6
    t = np.arange(n, dtype=float)
    b = (n * (t * v).sum() - t.sum() * v.sum()) / (
        n * (t * t).sum() - t.sum() ** 2
    )
    a = (v.sum() - b * t.sum()) / n
    w = 2.0 * v - (a + b * t)
    level = w[0]
    for i in range(n):
        level = 0.2 * w[i] + 0.8 * level
    exp = [0.5 * (level + (a + b * (n - 1 + h))) for h in (1, 2, 3)]

    out = (
        q_theta_forecast(str(tmp_path))
        .to_pandas()
        .sort_values("h")
        .reset_index(drop=True)
    )
    np.testing.assert_allclose(out["forecast"].to_numpy(), exp, atol=1e-6)
