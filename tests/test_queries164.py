"""Kernel tests for pipelines/queries164.py — Pettitt test,
Anderson-Darling time-of-day, Nelson-Aalen hazard."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write(tmp_path, ts, event_type="click", user_id=None):
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": event_type,
            "user_id": (
                np.zeros(n, dtype=np.int64) if user_id is None else user_id
            ),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_pettitt_finds_step(tmp_path):
    """Counts [2]*10 + [8]*10: the rank test breaks at k = 10 with
    U = -100 (every later value exceeds every earlier one)."""
    from signalsharp_ray.pipelines.queries164 import q_pettitt_test

    counts = [2] * 10 + [8] * 10
    days = pd.date_range("2024-01-01", periods=20, freq="1D")
    ts = np.concatenate([np.repeat(d, c) for d, c in zip(days, counts)])
    _write(tmp_path, pd.DatetimeIndex(ts))
    out = q_pettitt_test(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["k_star"] == 10
    assert abs(r["u_stat"]) == 100
    exp_p = 2.0 * math.exp(-6.0 * 100 * 100 / (20**3 + 20**2))
    assert r["p_approx"] == pytest.approx(exp_p, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_anderson_darling_clustered_vs_uniform(tmp_path):
    """Events clustered at 3am score a much larger AD than an evenly
    spread schedule."""
    from signalsharp_ray.pipelines.queries164 import q_anderson_darling_tod

    base = pd.Timestamp("2024-01-01")
    uni = base + pd.to_timedelta(
        (np.arange(1, 97) * 15) % 1440 + np.arange(96), unit="m"
    )
    clu = base + pd.to_timedelta(
        180 + (np.arange(96) % 8), unit="m"
    ) + pd.to_timedelta(np.arange(96) // 8, unit="D")
    ts = pd.DatetimeIndex(uni.tolist() + clu.tolist())
    et = ["uni"] * 96 + ["clu"] * 96
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": et,
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = (
        q_anderson_darling_tod(str(tmp_path)).to_pandas()
        .set_index("event_type")
    )
    assert out.loc["clu", "ad_stat"] > 10 * out.loc["uni", "ad_stat"]


@pytest.mark.usefixtures("ray_session")
def test_nelson_aalen_matches_direct(tmp_path):
    """3 users die at t=1 (2 users) and t=2 (1 user), none censored:
    H = d/n accumulates 2/3 then 2/3 + 1/1."""
    from signalsharp_ray.pipelines.queries164 import q_nelson_aalen

    # user 0: days 0-1; user 1: days 0-1; user 2: days 0-2.
    # end_day = 2, censor window = days 0,1,2 minus 2 => l >= 0 all
    # censored... use a longer window: last events well before the end.
    ts, uid = [], []
    for u, (f, l) in enumerate([(0, 1), (0, 1), (0, 2)]):
        ts.append(pd.Timestamp("2024-01-01") + pd.Timedelta(days=f))
        uid.append(u)
        ts.append(pd.Timestamp("2024-01-01") + pd.Timedelta(days=l))
        uid.append(u)
    # anchor user far in the future so the censor window misses others
    ts.append(pd.Timestamp("2024-01-20"))
    uid.append(99)
    _write(tmp_path, pd.DatetimeIndex(ts), user_id=np.array(uid))
    out = q_nelson_aalen(str(tmp_path))
    # deaths: t=1 (users 0,1), t=2 (user 2); user 99 censored at t=0
    # risk sets: t=1 -> 3 alive with t>=1... total 4 users, t=0 removes
    # the censored anchor first (t=0 < 1): risk at t=1 is 3.
    r1 = out[out["t_days"] == 1].iloc[0]
    assert r1["n_risk"] == 3 and r1["n_deaths"] == 2
    assert r1["cum_hazard"] == pytest.approx(2 / 3, abs=1e-6)
    r2 = out[out["t_days"] == 2].iloc[0]
    assert r2["n_risk"] == 1 and r2["n_deaths"] == 1
    assert r2["cum_hazard"] == pytest.approx(2 / 3 + 1.0, abs=1e-6)
    assert r2["survival_breslow"] == pytest.approx(
        math.exp(-(2 / 3 + 1.0)), abs=1e-6
    )
