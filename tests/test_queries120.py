"""Kernel tests for pipelines/queries120.py — the SLO burn-rate alert
predicate, the Shewhart integer violation rule, and the matrix-profile
discord's exclusion zone / tie-break."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, event_type, value, user=None):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.asarray(user if user is not None else np.ones(n), dtype=np.int64),
            "event_type": event_type,
            "value": np.asarray(value, dtype=np.float64),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_slo_burn_rate_fires_on_integer_predicate(tmp_path):
    from signalsharp_ray.pipelines.queries120 import q_slo_burn_rate

    # hour A: 2 bad / 10 -> 10*2 > 10 fires (burn 2.0)
    # hour B: 1 bad / 10 -> 10*1 > 10 is FALSE (burn exactly 1.0 does not page)
    ts = ["2024-01-01 10:00:30"] * 10 + ["2024-01-01 11:00:30"] * 10
    vals = [500.0, 500.0] + [50.0] * 8 + [500.0] + [50.0] * 9
    _write_events(tmp_path, ts, "api", vals)
    out = q_slo_burn_rate(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["hour"] == pd.Timestamp("2024-01-01 10:00:00")
    assert out.iloc[0]["n_bad"] == 2
    assert out.iloc[0]["burn_rate"] == pytest.approx(2.0)


@pytest.mark.usefixtures("ray_session")
def test_shewhart_flat_series_has_no_violations(tmp_path):
    from signalsharp_ray.pipelines.queries120 import q_shewhart_violations

    ts = [f"2024-01-01 {h:02d}:00:30" for h in range(10)]
    _write_events(tmp_path, ts, "flat", np.ones(10))
    out = q_shewhart_violations(str(tmp_path))
    assert len(out) == 0  # sigma = 0: strict inequality cannot fire


@pytest.mark.usefixtures("ray_session")
def test_shewhart_flags_the_spike_hour(tmp_path):
    from signalsharp_ray.pipelines.queries120 import q_shewhart_violations

    # 23 hours of 1 event + one hour of 30 events: only the spike is > 3 sigma
    ts = [f"2024-01-01 {h:02d}:00:30" for h in range(23)]
    ts += ["2024-01-01 23:00:30"] * 30
    _write_events(tmp_path, ts, "spiky", np.ones(len(ts)))
    out = q_shewhart_violations(str(tmp_path))
    assert list(out["hour"]) == [pd.Timestamp("2024-01-01 23:00:00")]
    assert out.iloc[0]["n_events"] == 30
    assert out.iloc[0]["zscore"] > 3.0


@pytest.mark.usefixtures("ray_session")
def test_discord_respects_exclusion_zone_and_finds_anomalous_week(tmp_path):
    from signalsharp_ray.pipelines.queries120 import q_discord_daily

    # 28 days of a flat daily rate except days 14-20 (a shifted week).
    # Every window overlapping the shifted week is far from its nearest
    # NON-OVERLAPPING neighbour; the discord must start inside it.
    ts = []
    for d in range(28):
        n = 20 if 14 <= d <= 20 else 5
        ts += [f"2024-01-{d + 1:02d} 12:00:00"] * n
    _write_events(tmp_path, ts, "load", np.ones(len(ts)))
    out = q_discord_daily(str(tmp_path))
    assert len(out) == 1
    day = out.iloc[0]["discord_day"].day
    assert 9 <= day <= 21  # a window overlapping the anomaly
    assert out.iloc[0]["mp_dist"] > 0
    assert out.iloc[0]["n_days"] == 28


@pytest.mark.usefixtures("ray_session")
def test_welch_ttest_matches_scipy_formula(tmp_path):
    from signalsharp_ray.pipelines.queries120 import q_welch_ttest_weekend

    # 2024-01-06/07 are Sat/Sun under the (d+3)%7>=5 convention
    ts = ["2024-01-01 10:00:00", "2024-01-02 10:00:00", "2024-01-03 10:00:00",
          "2024-01-06 10:00:00", "2024-01-07 10:00:00", "2024-01-06 11:00:00"]
    vals = [1.0, 2.0, 3.0, 10.0, 12.0, 14.0]
    _write_events(tmp_path, ts, "buy", vals)
    out = q_welch_ttest_weekend(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_weekday"] == 3 and r["n_weekend"] == 3
    # hand Welch on centivalues: weekday [100,200,300], weekend [1000,1200,1400]
    m0, m1 = 200.0, 1200.0
    v0, v1 = 10000.0, 40000.0
    a, b = v0 / 3, v1 / 3
    t = (m1 - m0) / np.sqrt(a + b)
    df = (a + b) ** 2 / (a * a / 2 + b * b / 2)
    assert r["t_welch"] == pytest.approx(t, abs=1e-6)
    assert r["df_welch"] == pytest.approx(df, abs=1e-6)
