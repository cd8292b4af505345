"""Kernel tests for pipelines/queries156.py — Granger, Engle-Granger,
integrated ACF time on constructed events tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_two_type_events(tmp_path, counts_a, counts_b):
    """Two event types with the given per-hour counts on a shared grid."""
    hours = pd.date_range("2024-01-01", periods=len(counts_a), freq="1h")
    ts, et = [], []
    for h, ca, cb in zip(hours, counts_a, counts_b):
        ts.extend([h] * int(ca))
        et.extend(["aaa"] * int(ca))
        ts.extend([h] * int(cb))
        et.extend(["bbb"] * int(cb))
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
def test_granger_detects_lagged_driver(tmp_path):
    """b_t tracks a_{t-1} (with deterministic jitter): a->b F-stat must
    dominate b->a."""
    from signalsharp_ray.pipelines.queries156 import q_granger_causality

    rng = np.random.RandomState(3)
    a = rng.randint(1, 8, size=60)
    b = np.empty(60, dtype=np.int64)
    b[0] = 3
    b[1:] = a[:-1] + rng.randint(0, 2, size=59)  # y_t ~ x_{t-1} + jitter
    # make 'aaa' the busiest so the (cause, effect) labels are stable
    a = a + 5
    _write_two_type_events(tmp_path, a, b)
    out = q_granger_causality(str(tmp_path))
    assert set(zip(out["cause"], out["effect"])) == {
        ("aaa", "bbb"),
        ("bbb", "aaa"),
    }
    f_ab = out.loc[out["cause"] == "aaa", "f_stat"].iloc[0]
    f_ba = out.loc[out["cause"] == "bbb", "f_stat"].iloc[0]
    assert f_ab > 10 * max(f_ba, 1e-9)
    assert (out["n_obs"] == 59).all()


@pytest.mark.usefixtures("ray_session")
def test_engle_granger_cointegrated_pair(tmp_path):
    """b = 2a + stationary jitter: beta ~ 2 and the residual ADF t-stat
    is strongly negative (mean-reverting residuals)."""
    from signalsharp_ray.pipelines.queries156 import q_engle_granger_coint

    rng = np.random.RandomState(5)
    a = rng.randint(5, 12, size=80)
    b = 2 * a + rng.randint(0, 3, size=80)
    _write_two_type_events(tmp_path, b, a)  # 'aaa' carries b (busier)
    out = q_engle_granger_coint(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["x_type"] == "aaa" and r["y_type"] == "bbb"
    assert r["n_obs"] == 80
    # y = 0.5 x - jitter/2 : beta ~ 0.5
    assert r["beta"] == pytest.approx(0.5, abs=0.05)
    assert r["adf_t"] < -3.0


@pytest.mark.usefixtures("ray_session")
def test_acf_alternating_series_tau_is_one(tmp_path):
    """Alternating counts have acf_1 < 0 -> zero terms, tau = 1."""
    from signalsharp_ray.pipelines.queries156 import q_acf_integrated_time

    counts = np.tile([2, 4], 16)  # 32 hours
    _write_two_type_events(tmp_path, counts, counts)
    out = q_acf_integrated_time(str(tmp_path)).to_pandas()
    assert len(out) == 2
    assert (out["n_terms"] == 0).all()
    np.testing.assert_allclose(out["tau"].to_numpy(), 1.0)


@pytest.mark.usefixtures("ray_session")
def test_acf_blocky_series_matches_direct(tmp_path):
    """Block-correlated series: tau matches a direct computation."""
    from signalsharp_ray.pipelines.queries156 import q_acf_integrated_time

    counts = np.tile([2, 2, 2, 2, 6, 6, 6, 6], 4)  # 32 hours
    _write_two_type_events(tmp_path, counts, counts)
    v = counts.astype(float)
    n = len(v)
    c = v - v.mean()
    c0 = (c * c).sum() / n
    acf = [((c[: n - k] * c[k:]).sum() / n) / c0 for k in range(1, 21)]
    n_terms = 20
    for k, r in enumerate(acf, start=1):
        if r < 0:
            n_terms = k - 1
            break
    exp_tau = 1.0 + 2.0 * sum(acf[:n_terms])

    out = q_acf_integrated_time(str(tmp_path)).to_pandas()
    assert (out["n_terms"] == n_terms).all()
    np.testing.assert_allclose(out["tau"].to_numpy(), exp_tau, atol=1e-6)
