"""Kernel tests for pipelines/queries121.py — DTW vs its L1 bound and
phase-shift behavior, Bartlett against scipy-free hand math, the sign
test's exact binomial tail."""

import math

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
def test_dtw_shifted_profile_warps_cheaper_than_l1(tmp_path):
    from signalsharp_ray.pipelines.queries121 import q_dtw_hour_profiles

    # type a peaks at hour 6, type b is the SAME peak 2 hours later:
    # DTW can warp the phase shift away almost entirely, L1 cannot.
    ts, types = [], []
    for h, n in [(6, 10), (7, 4)]:
        ts += [f"2024-01-01 {h:02d}:00:00"] * n
        types += ["a"] * n
    for h, n in [(8, 10), (9, 4)]:
        ts += [f"2024-01-01 {h:02d}:00:00"] * n
        types += ["b"] * n
    _write_events(tmp_path, ts, types, np.ones(len(ts)))
    out = q_dtw_hour_profiles(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert r["dtw_dist"] < r["l1_dist"]  # warping absorbs the shift
    assert r["dtw_dist"] >= 0


@pytest.mark.usefixtures("ray_session")
def test_dtw_identical_profiles_zero(tmp_path):
    from signalsharp_ray.pipelines.queries121 import q_dtw_hour_profiles

    ts = ["2024-01-01 05:00:00"] * 3 + ["2024-01-01 09:00:00"] * 2
    _write_events(
        tmp_path, ts * 2, ["x"] * 5 + ["y"] * 5, np.ones(10)
    )
    out = q_dtw_hour_profiles(str(tmp_path))
    assert out.iloc[0]["dtw_dist"] == 0
    assert out.iloc[0]["l1_dist"] == 0


@pytest.mark.usefixtures("ray_session")
def test_bartlett_matches_hand_formula(tmp_path):
    from signalsharp_ray.pipelines.queries121 import q_bartlett_test

    # two groups with visibly different spreads (centivalues exact)
    ts = ["2024-01-01 10:00:00"] * 8
    types = ["lo"] * 4 + ["hi"] * 4
    vals = [1.0, 1.01, 0.99, 1.0, 1.0, 5.0, 9.0, 13.0]
    _write_events(tmp_path, ts, types, vals)
    out = q_bartlett_test(str(tmp_path))
    assert len(out) == 1
    # hand Bartlett on centivalues
    groups = [np.array([100, 101, 99, 100]), np.array([100, 500, 900, 1300])]
    k, N = 2, 8
    vs = [g.var(ddof=1) for g in groups]
    sp2 = sum(3 * v for v in vs) / (N - k)
    t_num = (N - k) * math.log(sp2) - sum(3 * math.log(v) for v in vs)
    c = 1.0 + (sum(1.0 / 3 for _ in vs) - 1.0 / (N - k)) / (3 * (k - 1))
    assert out.iloc[0]["bartlett_t"] == pytest.approx(t_num / c, abs=1e-5)
    assert out.iloc[0]["n_total"] == 8


@pytest.mark.usefixtures("ray_session")
def test_sign_test_exact_binomial_tail(tmp_path):
    from signalsharp_ray.pipelines.queries121 import q_sign_test_halves

    # 8 days: second half strictly busier on every paired day ->
    # pos=4, neg=0, p = 2 * C(4,0)/16 = 0.125 exactly
    ts = []
    for d in range(4):
        ts += [f"2024-01-{d + 1:02d} 12:00:00"] * 2
    for d in range(4, 8):
        ts += [f"2024-01-{d + 1:02d} 12:00:00"] * 5
    _write_events(tmp_path, ts, "load", np.ones(len(ts)))
    out = q_sign_test_halves(str(tmp_path))
    r = out.iloc[0]
    assert r["n_pos"] == 4 and r["n_neg"] == 0
    assert r["p_sign"] == pytest.approx(0.125)


@pytest.mark.usefixtures("ray_session")
def test_friedman_detects_consistent_ordering(tmp_path):
    from signalsharp_ray.pipelines.queries121 import q_friedman_test

    # type "big" beats "small" every day -> ranks 2 vs 1 every block;
    # chi2 = 12/(n*2*3) * (n^2 + 4n^2) - 3n*3 = n (for k=2)
    ts, types = [], []
    for d in range(6):
        ts += [f"2024-01-{d + 1:02d} 12:00:00"] * 1
        types += ["small"]
        ts += [f"2024-01-{d + 1:02d} 13:00:00"] * 3
        types += ["big"] * 3
    _write_events(tmp_path, ts, types, np.ones(len(ts)))
    out = q_friedman_test(str(tmp_path)).set_index("event_type")
    assert out.loc["big", "mean_rank"] == pytest.approx(2.0)
    assert out.loc["small", "mean_rank"] == pytest.approx(1.0)
    assert out.loc["big", "chi2_friedman"] == pytest.approx(6.0)
