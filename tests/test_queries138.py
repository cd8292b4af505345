"""Kernel tests for pipelines/queries138.py — seasonality strength on a
pure cycle vs noise, and the power formula against hand math."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    # rows: (user, ts, type)
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.ones(len(rows)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_seasonality_strength_high_for_pure_cycle(tmp_path):
    from signalsharp_ray.pipelines.queries138 import q_seasonality_strength

    rows = []
    for d in range(5):
        for h in range(24):
            # hard daily spike + a tiny day-level trend so the
            # trend+resid variance is nonzero (a PERFECTLY periodic
            # series is excluded on both sides: var(x - seasonal) = 0)
            n = 1 + (6 if h == 12 else 0) + (1 if (d >= 3 and h == 0) else 0)
            rows += [(1, f"2024-01-{d + 1:02d} {h:02d}:00:30", "cyc")] * n
    _write_events(tmp_path, rows)
    out = q_seasonality_strength(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert r["f_seasonal"] > 0.9  # the cycle explains nearly everything
    assert 0.0 <= r["f_trend"] <= 1.0


@pytest.mark.usefixtures("ray_session")
def test_ab_power_hand_formula(tmp_path):
    from signalsharp_ray.pipelines.queries138 import (
        Z_ALPHA,
        Z_BETA,
        q_ab_power_analysis,
    )

    # arm a (even): 1 of 2 converts (pa=.5); arm b (odd): 2 of 2 (pb=1)
    rows = [
        (2, "2024-01-01 10:00", "purchase"),
        (4, "2024-01-01 10:00", "view"),
        (1, "2024-01-01 10:00", "purchase"),
        (3, "2024-01-01 10:00", "purchase"),
    ]
    _write_events(tmp_path, rows)
    out = q_ab_power_analysis(str(tmp_path))
    r = out.iloc[0]
    pa_, pb_ = 0.5, 1.0
    pbar = 0.75
    num = Z_ALPHA * math.sqrt(2 * pbar * (1 - pbar)) + Z_BETA * math.sqrt(
        pa_ * 0.5 + pb_ * 0.0
    )
    expect = num * num / ((pb_ - pa_) ** 2)
    assert r["n_required_per_arm"] == pytest.approx(expect, abs=1e-5)
