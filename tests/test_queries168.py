"""Kernel tests for pipelines/queries168.py — drawdown durations and
tail dependence."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_two(tmp_path, counts_by_type, freq="1h"):
    ts, et = [], []
    for name, counts in counts_by_type.items():
        hours = pd.date_range("2024-01-01", periods=len(counts), freq=freq)
        for h, c in zip(hours, counts):
            ts.extend([h] * int(c))
            et.extend([name] * int(c))
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


@pytest.mark.usefixtures("ray_session")
def test_drawdown_durations_known_runs(tmp_path):
    """Daily counts [5,3,3,5,6,2,6]: drawdowns at days 2-3 (len 2) and
    day 6 (len 1)."""
    from signalsharp_ray.pipelines.queries168 import q_drawdown_durations

    counts = [5, 3, 3, 5, 6, 2, 6]
    _write_two(tmp_path, {"click": counts}, freq="1D")
    out = q_drawdown_durations(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert r["n_days"] == 7
    assert r["n_drawdowns"] == 2
    assert r["longest_days"] == 2
    assert r["total_underwater_days"] == 3
    assert r["underwater_share"] == pytest.approx(3 / 7, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_drawdown_monotone_has_none(tmp_path):
    from signalsharp_ray.pipelines.queries168 import q_drawdown_durations

    _write_two(tmp_path, {"click": [2, 3, 4, 5, 6]}, freq="1D")
    out = q_drawdown_durations(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert r["n_drawdowns"] == 0 and r["total_underwater_days"] == 0


@pytest.mark.usefixtures("ray_session")
def test_tail_dependence_synced_vs_independent(tmp_path):
    """b spikes exactly when a spikes: lambda_u = 1."""
    from signalsharp_ray.pipelines.queries168 import q_tail_dependence

    base_a = np.full(100, 3)
    base_a[[10, 40, 70, 90]] = 20
    base_b = np.full(100, 2)
    base_b[[10, 40, 70, 90]] = 15
    # 'aaa' busier
    _write_two(tmp_path, {"aaa": base_a, "bbb": base_b})
    out = q_tail_dependence(str(tmp_path))
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("aaa", "bbb")
    assert r["n_hours"] == 100
    assert r["n_a_exc"] == 4 and r["n_joint"] == 4
    assert r["lambda_u"] == 1.0
