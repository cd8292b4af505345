"""Kernel tests for pipelines/queries135.py — Lindley hand replay, M4
bucket extremes, Hill estimator on an exact Pareto-like ladder."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, values=None, event_type="t"):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": event_type,
            "value": np.asarray(
                values if values is not None else np.ones(n), dtype=np.float64
            ),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_lindley_hand_replay(tmp_path):
    from signalsharp_ray.pipelines.queries135 import q_lindley_queue_replay

    # arrivals at 0ms, 100ms, 150ms, 1000ms; service 200ms
    # gaps: 100ms, 50ms, 850ms (in us: 100k, 50k, 850k)
    # W: 0 -> max(0, 0+200k-100k)=100k -> max(0,100k+200k-50k)=250k
    #   -> max(0, 250k+200k-850k)=0
    ts = [
        "2024-01-01 00:00:00.000000",
        "2024-01-01 00:00:00.100000",
        "2024-01-01 00:00:00.150000",
        "2024-01-01 00:00:01.000000",
    ]
    _write_events(tmp_path, ts)
    out = q_lindley_queue_replay(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert r["n_events"] == 4
    assert r["n_delayed"] == 2
    assert r["total_wait_us"] == 100_000 + 250_000
    assert r["max_wait_us"] == 250_000


@pytest.mark.usefixtures("ray_session")
def test_m4_keeps_extremes_and_endpoints(tmp_path):
    from signalsharp_ray.pipelines import queries135

    ts = [f"2024-01-01 00:00:{s:02d}" for s in range(10)]
    vals = [5.0, 1.0, 9.0, 4.0, 4.0, 7.0, 2.0, 8.0, 3.0, 6.0]
    _write_events(tmp_path, ts, vals)
    out = queries135.q_m4_downsample(str(tmp_path), n_buckets=2).to_pandas()
    out = out.set_index("bucket")
    # bucket 0 = first 5 seconds, bucket 1 = last 5
    assert out.loc[0, "min_c"] == 100 and out.loc[0, "max_c"] == 900
    assert out.loc[0, "first_c"] == 500 and out.loc[0, "last_c"] == 400
    assert out.loc[1, "first_c"] == 700 and out.loc[1, "last_c"] == 600
    assert out.loc[1, "min_c"] == 200 and out.loc[1, "max_c"] == 800


@pytest.mark.usefixtures("ray_session")
def test_hill_exact_on_geometric_ladder(tmp_path):
    from signalsharp_ray.pipelines import queries135

    # values 2^j: ln spacing constant; with k=4 and ladder
    # [32,16,8,4,2]: H = (1/4)(ln16 + ln8/2? ...) compute by hand below
    ts = [f"2024-01-01 00:00:{s:02d}" for s in range(5)]
    vals = [32.0, 16.0, 8.0, 4.0, 2.0]
    _write_events(tmp_path, ts, vals)
    out = queries135.q_hill_tail_index(str(tmp_path), k=4)
    r = out.iloc[0]
    import math

    pivot = 200  # 2.0 in cents
    expect = sum(
        math.log(c / pivot) for c in (3200, 1600, 800, 400)
    ) / 4
    assert r["pivot_c"] == pivot
    assert r["hill_h"] == pytest.approx(expect, abs=1e-6)
    assert r["alpha"] == pytest.approx(1 / expect, abs=1e-6)
