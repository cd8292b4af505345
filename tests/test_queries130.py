"""Kernel tests for pipelines/queries130.py — periodogram dominance on
a constructed daily cycle, Theil's U extremes, variogram math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, event_type="t"):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": event_type,
            "value": np.ones(n),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


def _daily_cycle(days):
    ts = []
    for d in range(days):
        for h in range(24):
            # cosine-ish daily bump peaking at noon
            n = 1 + int(4 * (1 + np.cos(2 * np.pi * (h - 12) / 24)) / 2)
            ts += [f"2024-01-{d + 1:02d} {h:02d}:00:30"] * n
    return ts


@pytest.mark.usefixtures("ray_session")
def test_periodogram_finds_daily_cycle(tmp_path):
    from signalsharp_ray.pipelines.queries130 import q_periodogram

    _write_events(tmp_path, _daily_cycle(6))
    out = q_periodogram(str(tmp_path))
    dom = out[out["dominant"] == 1]
    assert len(dom) == 1
    assert dom.iloc[0]["period_h"] == 24
    assert out["fisher_g"].sum() == pytest.approx(1.0, abs=1e-4)


@pytest.mark.usefixtures("ray_session")
def test_theils_u_zero_for_constant_series(tmp_path):
    from signalsharp_ray.pipelines.queries130 import q_theils_u

    ts = [f"2024-01-01 {h:02d}:00:30" for h in range(12)] * 3
    _write_events(tmp_path, ts)
    out = q_theils_u(str(tmp_path))
    # constant 3-per-hour series: naive forecast is perfect
    assert out.iloc[0]["theil_u1"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_variogram_alternating_series(tmp_path):
    from signalsharp_ray.pipelines.queries130 import q_variogram

    # counts alternate 3,1,3,1,... over 8 hours:
    # lag1 diffs all +-2 -> gamma = 4*7/(2*7) = 2; lag2 diffs 0 -> gamma 0
    ts = []
    for h in range(8):
        ts += [f"2024-01-01 {h:02d}:00:30"] * (3 if h % 2 == 0 else 1)
    _write_events(tmp_path, ts)
    out = q_variogram(str(tmp_path)).set_index("lag_h")
    assert out.loc[1, "gamma"] == pytest.approx(2.0)
    assert out.loc[2, "gamma"] == pytest.approx(0.0)
    assert out.loc[4, "gamma"] == pytest.approx(0.0)
