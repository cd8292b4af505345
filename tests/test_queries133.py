"""Kernel tests for pipelines/queries133.py — cohort offsets and
cumulative value, win-back gap semantics, activation latency."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    # rows: (user, ts, value)
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": "e",
            "value": np.array([r[2] for r in rows], dtype=np.float64),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_cohort_value_curve_cumulative(tmp_path):
    from signalsharp_ray.pipelines.queries133 import q_cohort_value_curve

    rows = [
        (1, "2024-01-01 10:00", 1.00),   # cohort Jan-1, offset 0
        (1, "2024-01-03 10:00", 2.00),   # offset 2
        (2, "2024-01-01 12:00", 5.00),   # cohort Jan-1, offset 0
        (3, "2024-01-02 09:00", 10.00),  # cohort Jan-2, offset 0
    ]
    _write_events(tmp_path, rows)
    out = q_cohort_value_curve(str(tmp_path)).set_index(
        ["cohort_day", "day_offset"]
    )
    j1 = pd.Timestamp("2024-01-01")
    j2 = pd.Timestamp("2024-01-02")
    assert out.loc[(j1, 0), "cents"] == 600
    assert out.loc[(j1, 2), "cents"] == 200
    assert out.loc[(j1, 2), "cum_cents"] == 800
    assert out.loc[(j2, 0), "cum_cents"] == 1000


@pytest.mark.usefixtures("ray_session")
def test_winback_counts_gap_days(tmp_path):
    from signalsharp_ray.pipelines.queries133 import q_winback_reactivations

    rows = [
        (1, "2024-01-01 10:00", 1.0),
        (1, "2024-01-04 10:00", 1.0),  # gap 3 days -> reactivation
        (1, "2024-01-05 10:00", 1.0),  # gap 1 -> no
        (2, "2024-01-02 10:00", 1.0),
        (2, "2024-01-04 09:00", 1.0),  # gap 2 -> reactivation
    ]
    _write_events(tmp_path, rows)
    out = q_winback_reactivations(str(tmp_path)).set_index("day")
    d = pd.Timestamp("2024-01-04")
    assert out.loc[d, "n_reactivations"] == 2
    assert out.loc[d, "n_users"] == 2
    assert len(out) == 1


@pytest.mark.usefixtures("ray_session")
def test_time_to_second_event_hours(tmp_path):
    from signalsharp_ray.pipelines.queries133 import q_time_to_second_event

    rows = [
        (1, "2024-01-01 10:00", 1.0),
        (1, "2024-01-01 13:30", 1.0),  # 3.5h -> bucket 3
        (2, "2024-01-01 10:00", 1.0),
        (2, "2024-01-02 10:00", 1.0),  # 24h -> bucket 24
        (3, "2024-01-01 10:00", 1.0),  # single event: excluded
    ]
    _write_events(tmp_path, rows)
    out = q_time_to_second_event(str(tmp_path)).set_index("latency_h")
    assert out.loc[3, "n_users"] == 1
    assert out.loc[24, "n_users"] == 1
    assert out["n_users"].sum() == 2
