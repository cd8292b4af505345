"""Kernel tests for pipelines/queries171.py — Newey-West LRV and
energy distance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, counts_by_type=None, values_by_type=None, freq="1D"):
    ts, et, val = [], [], []
    if counts_by_type:
        for name, counts in counts_by_type.items():
            periods = pd.date_range(
                "2024-01-01", periods=len(counts), freq=freq
            )
            for h, c in zip(periods, counts):
                ts.extend([h] * int(c))
                et.extend([name] * int(c))
                val.extend([1.0] * int(c))
    if values_by_type:
        base = pd.Timestamp("2024-01-01")
        for name, values in values_by_type.items():
            for i, v in enumerate(values):
                ts.append(base + pd.Timedelta(minutes=i))
                et.append(name)
                val.append(float(v))
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": pd.DatetimeIndex(ts),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": et,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.asarray(val, dtype=np.float64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_newey_west_positive_autocorr_shrinks_neff(tmp_path):
    """Blocky (positively autocorrelated) counts: lrv > c0, so
    n_eff < n; matches a direct replay."""
    from signalsharp_ray.pipelines.queries171 import q_newey_west_lrv

    counts = np.repeat([3, 9, 4, 10, 3, 8], 5)  # 30 days, sticky blocks
    _write(tmp_path, counts_by_type={"click": counts})
    out = q_newey_west_lrv(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    v = counts.astype(float)
    n = len(v)
    c = v - v.mean()
    c0 = (c * c).sum() / n
    lrv = c0
    for k in range(1, 6):
        lrv += 2 * (1 - k / 6) * ((c[: n - k] * c[k:]).sum() / n)
    assert r["c0"] == pytest.approx(c0, abs=1e-5)
    assert r["lrv"] == pytest.approx(lrv, abs=1e-5)
    assert r["lrv"] > r["c0"]
    assert r["n_eff"] < n
    assert r["se_mean"] == pytest.approx(np.sqrt(lrv / n), abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_energy_distance_identical_is_zero(tmp_path):
    from signalsharp_ray.pipelines.queries171 import q_energy_distance

    vals = [1.0, 2.0, 3.0, 4.0] * 10
    _write(
        tmp_path,
        values_by_type={"aaa": vals + vals, "bbb": vals},
    )
    out = q_energy_distance(str(tmp_path))
    r = out.iloc[0]
    assert r["energy_d2"] == pytest.approx(0.0, abs=1e-9)


@pytest.mark.usefixtures("ray_session")
def test_energy_distance_shifted(tmp_path):
    """Point masses at 0 and at 3: E|X-Y| = 3, E|X-X'| = E|Y-Y'| = 0,
    D^2 = 6."""
    from signalsharp_ray.pipelines.queries171 import q_energy_distance

    _write(
        tmp_path,
        values_by_type={"aaa": [0.0] * 20, "bbb": [3.0] * 10},
    )
    out = q_energy_distance(str(tmp_path))
    r = out.iloc[0]
    assert r["e_xy"] == pytest.approx(3.0, abs=1e-6)
    assert r["e_xx"] == 0.0 and r["e_yy"] == 0.0
    assert r["energy_d2"] == pytest.approx(6.0, abs=1e-6)
