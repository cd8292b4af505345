"""Kernel tests for pipelines/queries170.py — Kendall's W and Cohen's
kappa."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, counts_by_type, freq="1D"):
    ts, et = [], []
    for name, counts in counts_by_type.items():
        periods = pd.date_range("2024-01-01", periods=len(counts), freq=freq)
        for h, c in zip(periods, counts):
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
def test_kendall_w_perfect_agreement(tmp_path):
    """Three types whose daily counts rise together: W = 1."""
    from signalsharp_ray.pipelines.queries170 import q_kendall_w_types

    base = np.arange(2, 12)  # strictly increasing, no ties
    _write(
        tmp_path,
        {"a": base, "b": base * 2, "c": base + 5},
    )
    out = q_kendall_w_types(str(tmp_path))
    r = out.iloc[0]
    assert r["n_days"] == 10 and r["n_types"] == 3
    assert r["w"] == pytest.approx(1.0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_kendall_w_opposed_rankings(tmp_path):
    """Two types with exactly reversed day rankings: rank sums are
    constant -> W = 0."""
    from signalsharp_ray.pipelines.queries170 import q_kendall_w_types

    up = np.arange(2, 10)
    down = up[::-1]
    _write(tmp_path, {"a": up, "b": down})
    out = q_kendall_w_types(str(tmp_path))
    r = out.iloc[0]
    assert r["w"] == pytest.approx(0.0, abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_cohens_kappa_synced_streams(tmp_path):
    """b busy exactly when a is busy: kappa = 1."""
    from signalsharp_ray.pipelines.queries170 import q_cohens_kappa_busy

    a = np.tile([2, 10], 24)  # alternating busy/quiet
    b = np.tile([1, 7], 24)
    _write(tmp_path, {"aaa": a + 3, "bbb": b}, freq="1h")  # aaa busier
    out = q_cohens_kappa_busy(str(tmp_path))
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("aaa", "bbb")
    assert r["p_observed"] == 1.0
    assert r["kappa"] == pytest.approx(1.0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_cohens_kappa_anti_synced(tmp_path):
    """b busy exactly when a is quiet: kappa = -1."""
    from signalsharp_ray.pipelines.queries170 import q_cohens_kappa_busy

    a = np.tile([2, 10], 24)
    b = np.tile([7, 1], 24)
    _write(tmp_path, {"aaa": a + 3, "bbb": b}, freq="1h")
    out = q_cohens_kappa_busy(str(tmp_path))
    r = out.iloc[0]
    assert r["p_observed"] == 0.0
    assert r["kappa"] == pytest.approx(-1.0, abs=1e-6)
