"""Kernel tests for pipelines/queries67.py — OLS SSE helper and Gumbel
moment-fit known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries67 import (
    EULER_GAMMA,
    _ols_sse,
    q_block_maxima_gumbel,
)


def test_ols_sse_perfect_line():
    t = np.arange(5, dtype=np.int64)
    y = 2 * t + 3
    sse, ok = _ols_sse(t, y)
    assert ok
    assert abs(sse) < 1e-9


def test_ols_sse_known_residual():
    # y = 0,1,0 over t = 0,1,2: OLS line is flat y = 1/3; SSE = 2/3
    sse, ok = _ols_sse(np.array([0, 1, 2]), np.array([0, 1, 0]))
    assert ok
    assert abs(sse - 2.0 / 3.0) < 1e-12


def test_ols_sse_degenerate():
    _, ok = _ols_sse(np.array([1, 1]), np.array([2, 3]))
    assert not ok


@pytest.mark.usefixtures("ray_session")
def test_gumbel_known(tmp_path):
    # Two days: day 1 has max hourly count 3, day 2 has max 1.
    ts = (
        [np.datetime64("2024-01-01T05:00:01", "us"),
         np.datetime64("2024-01-01T05:00:02", "us"),
         np.datetime64("2024-01-01T05:00:03", "us")]
        + [np.datetime64("2024-01-02T05:00:01", "us")]
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
    out = q_block_maxima_gumbel(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_days"] == 2
    # maxima {3, 1}: mean 2, population sd 1
    assert r["max_mean"] == 2.0
    beta = math.sqrt(6.0) / math.pi
    assert r["gumbel_beta"] == round(beta, 6)
    assert r["gumbel_mu"] == round(2.0 - EULER_GAMMA * beta, 6)
