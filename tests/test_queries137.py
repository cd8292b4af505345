"""Kernel tests for pipelines/queries137.py — SRM/conversion hand math,
CUPED on perfectly correlated halves, DiD on a constructed lift."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    # rows: (user, ts, type, value)
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.array([r[3] for r in rows], dtype=np.float64),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_ab_srm_and_conversion(tmp_path):
    from signalsharp_ray.pipelines.queries137 import q_ab_test_srm

    # arm 0 (even ids): users 2, 4 — one converts
    # arm 1 (odd ids): users 1, 3 — both convert
    rows = [
        (2, "2024-01-01 10:00", "purchase", 1.0),
        (4, "2024-01-01 10:00", "view", 1.0),
        (1, "2024-01-01 10:00", "purchase", 1.0),
        (3, "2024-01-01 10:00", "purchase", 1.0),
    ]
    _write_events(tmp_path, rows)
    out = q_ab_test_srm(str(tmp_path))
    r = out.iloc[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["srm_chi2"] == pytest.approx(0.0)
    assert r["conv_a"] == pytest.approx(0.5)
    assert r["conv_b"] == pytest.approx(1.0)
    assert r["z_conversion"] > 0


@pytest.mark.usefixtures("ray_session")
def test_cuped_full_reduction_when_halves_identical(tmp_path):
    from signalsharp_ray.pipelines.queries137 import (
        q_cuped_variance_reduction,
    )

    # 10 days (mid = day 5): each user spends the same in both halves ->
    # pre == post per user -> theta 1, reduction 1, var_adjusted 0
    rows = []
    for u, amt in [(1, 10.0), (2, 20.0), (3, 30.0)]:
        rows.append((u, "2024-01-02 10:00", "e", amt))
        rows.append((u, "2024-01-09 10:00", "e", amt))
    _write_events(tmp_path, rows)
    out = q_cuped_variance_reduction(str(tmp_path))
    r = out.iloc[0]
    assert r["n_users"] == 3
    assert r["theta"] == pytest.approx(1.0)
    assert r["var_adjusted"] == pytest.approx(0.0, abs=1e-6)
    assert r["reduction"] == pytest.approx(1.0)


@pytest.mark.usefixtures("ray_session")
def test_diff_in_diff_detects_lift(tmp_path):
    from signalsharp_ray.pipelines.queries137 import q_diff_in_diff

    # control (even) means: pre 10, post 12 (+2 ambient)
    # treat (odd) means: pre 10, post 17 (+7) -> DiD = 5
    rows = [
        (2, "2024-01-02 10:00", "e", 10.0),
        (2, "2024-01-09 10:00", "e", 12.0),
        (1, "2024-01-02 10:00", "e", 10.0),
        (1, "2024-01-09 10:00", "e", 17.0),
    ]
    _write_events(tmp_path, rows)
    out = q_diff_in_diff(str(tmp_path))
    r = out.iloc[0]
    assert r["mean_ctrl_pre"] == pytest.approx(1000.0)  # cents
    assert r["did_estimate"] == pytest.approx(500.0)
