"""Kernel tests for pipelines/queries34.py — time reversibility /
post-peak decay / brand share known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries34 import (
    q_brand_revenue_share,
    q_post_peak_decay,
    q_time_reversibility,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
D = lambda s: np.datetime64(s, "us")


def _events_by_hour(counts):
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    n = len(hours)
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_time_reversibility_sawtooth_negative(tmp_path):
    # slow climb +1 x4, fast crash -4: deltas {1,1,1,1,-4} -> negative skew
    counts = []
    level = 10
    for _ in range(8):
        for _ in range(4):
            level += 1
            counts.append(level)
        level -= 4
        counts.append(level)
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_time_reversibility(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert df.iloc[0]["delta_skew"] < -0.5


@pytest.mark.usefixtures("ray_session")
def test_post_peak_decay(tmp_path):
    # one spike at hour 10 (load 100), flat 5 elsewhere over 20 hours
    counts = [5] * 20
    counts[10] = 100
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_post_peak_decay(str(tmp_path)).set_index("offset_h")
    assert (out["n_triggers"] == 1).all()
    assert out.loc[1, "mean_load"] == 5.0
    assert out.loc[6, "mean_load"] == 5.0
    expected_mean = (5 * 19 + 100) / 20.0
    assert out.loc[1, "grid_mean"] == round(expected_mean, 6)


@pytest.mark.usefixtures("ray_session")
def test_brand_revenue_share(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.array([10, 10, 11], dtype=np.int64),
            "l_suppkey": np.ones(3, dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [100.0, 200.0, 300.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    part = pd.DataFrame(
        {
            "p_partkey": np.array([10, 11], dtype=np.int64),
            "p_name": ["a", "b"],
            "p_brand": ["BRAND#1", "BRAND#2"],
            "p_type": ["T"] * 2,
            "p_size": np.array([1, 1], dtype=np.int32),
            "p_retailprice": [1.0] * 2,
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(part), tmp_path / "part.parquet")
    out = q_brand_revenue_share(str(tmp_path)).set_index("brand")
    assert out.loc["BRAND#1", "revenue"] == 300.0
    assert out.loc["BRAND#1", "rev_share"] == 0.5
    assert out.loc["BRAND#2", "rev_share"] == 0.5
