"""Kernel tests for pipelines/queries66.py — rank-sum helper known
answers and a Mann-Whitney end-to-end sanity check."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries66 import (
    _rank_sum,
    q_mann_whitney_weekend,
)


def test_rank_sum_no_ties():
    # values 3,1,2 with flags on 3 and 2 -> ranks 3 and 2 -> sum 5
    r, tie = _rank_sum(np.array([3, 1, 2]), np.array([True, False, True]))
    assert r == 5.0
    assert tie == 0


def test_rank_sum_ties():
    # values 1,1,2 -> average ranks 1.5,1.5,3; flag the pair of 1s
    r, tie = _rank_sum(np.array([1, 1, 2]), np.array([True, True, False]))
    assert r == 3.0
    assert tie == 2 ** 3 - 2  # one tie group of size 2


@pytest.mark.usefixtures("ray_session")
def test_mann_whitney_weekend_shape(tmp_path):
    # 2024-01-06/07 is a weekend; 2024-01-08 is a Monday.
    ts = (
        [np.datetime64("2024-01-06T00:30:00", "us") + np.timedelta64(h, "h")
         for h in range(12)]
        + [np.datetime64("2024-01-08T00:30:00", "us") + np.timedelta64(h, "h")
           for h in range(12)]
    )
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": np.ones(n, dtype=np.float64),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_mann_whitney_weekend(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # grid spans 2024-01-06T00 .. 2024-01-08T11 inclusive = 60 hourly
    # buckets; 48 of them (Jan 6-7) are weekend.
    assert r["n_weekend"] == 48
    assert r["n_weekday"] == 12
    # all non-zero counts are 1: heavy ties, U must sit inside [0, n1*n2]
    assert 0.0 <= r["u_stat"] <= 48 * 12
