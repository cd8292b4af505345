"""Kernel tests for pipelines/queries161.py — ADF unit-root test and
the Ferro-Segers extremal index."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_counts(tmp_path, counts_by_type):
    ts, et = [], []
    for name, counts in counts_by_type.items():
        hours = pd.date_range("2024-01-01", periods=len(counts), freq="1h")
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
def test_adf_mean_reverting_is_negative(tmp_path):
    """Noisy oscillation mean-reverts: gamma well below 0, adf_t
    strongly negative."""
    from signalsharp_ray.pipelines.queries161 import q_adf_level_test

    rng = np.random.RandomState(4)
    counts = np.where(np.arange(60) % 2 == 0, 2, 8) + rng.randint(
        0, 3, size=60
    )
    _write_counts(tmp_path, {"click": counts})
    out = q_adf_level_test(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_obs"] == 59
    assert r["gamma"] < -1.0
    assert r["adf_t"] < -5.0


@pytest.mark.usefixtures("ray_session")
def test_adf_drifting_level_near_zero(tmp_path):
    """A noisy drifting level keeps gamma near 0 — the unit-root side."""
    from signalsharp_ray.pipelines.queries161 import q_adf_level_test

    rng = np.random.RandomState(6)
    counts = np.arange(2, 62) + rng.randint(0, 3, size=60)
    _write_counts(tmp_path, {"click": counts})
    out = q_adf_level_test(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert abs(r["gamma"]) < 0.3
    assert r["adf_t"] > -3.5


@pytest.mark.usefixtures("ray_session")
def test_adf_degenerate_fit_skipped(tmp_path):
    """Perfect alternation fits the DF regression exactly (zero
    residual) — the s2 <= 0 guard must skip it on both engines."""
    from signalsharp_ray.pipelines.queries161 import q_adf_level_test

    counts = np.tile([2, 8], 30)
    _write_counts(tmp_path, {"click": counts})
    out = q_adf_level_test(str(tmp_path)).to_pandas()
    assert len(out) == 0


@pytest.mark.usefixtures("ray_session")
def test_extremal_index_isolated_vs_clustered(tmp_path):
    """Isolated spikes give theta ~ 1; back-to-back spike pairs lower
    it. 200 hours so the p95 threshold stays on the base level."""
    from signalsharp_ray.pipelines.queries161 import q_extremal_index

    iso = np.full(200, 2)
    iso[[20, 60, 100, 140, 180]] = 20
    clu = np.full(200, 2)
    clu[[20, 21, 90, 91, 160, 161]] = 20
    _write_counts(tmp_path, {"iso": iso, "clu": clu})
    out = q_extremal_index(str(tmp_path)).to_pandas().set_index("event_type")
    assert out.loc["iso", "threshold"] == 2
    assert out.loc["iso", "n_exceedances"] == 5
    assert out.loc["clu", "n_exceedances"] == 6
    assert out.loc["iso", "theta"] > 0.9
    assert out.loc["clu", "theta"] < out.loc["iso", "theta"]
