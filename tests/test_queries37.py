"""Kernel tests for pipelines/queries37.py — variance halves / priority
mix / kurtosis known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries37 import (
    q_load_kurtosis,
    q_priority_mix_by_year,
    q_variance_ratio_halves,
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
def test_variance_ratio_halves(tmp_path):
    # first half alternates 4/6 (var 1); second alternates 2/8 (var 9)
    counts = [4, 6, 4, 6] + [2, 8, 2, 8]
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_variance_ratio_halves(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_first"] == 4 and r["n_second"] == 4
    assert r["var_first"] == 1.0
    assert r["var_second"] == 9.0
    assert r["f_ratio"] == 9.0


@pytest.mark.usefixtures("ray_session")
def test_priority_mix_by_year(tmp_path):
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(4, dtype=np.int64),
            "o_custkey": np.ones(4, dtype=np.int64),
            "o_orderstatus": ["O"] * 4,
            "o_totalprice": [1.0] * 4,
            "o_orderdate": [D("1995-03-01"), D("1995-07-01"),
                            D("1996-03-01"), D("1996-03-02")],
            "o_orderpriority": ["1-URGENT", "2-HIGH", "1-URGENT", "1-URGENT"],
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_priority_mix_by_year(str(tmp_path)).set_index(["year", "priority"])
    assert out.loc[(1995, "1-URGENT"), "year_share"] == 0.5
    assert out.loc[(1996, "1-URGENT"), "year_share"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_load_kurtosis_spiky_positive(tmp_path):
    # flat load with one huge spike -> strongly positive excess kurtosis
    counts = [5] * 47 + [100]
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_load_kurtosis(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert df.iloc[0]["excess_kurtosis"] > 10
