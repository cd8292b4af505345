"""Kernel tests for pipelines/queries25.py — vocab coverage / burst topk /
region balance / gap autocorrelation known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries25 import (
    q_gap_autocorr,
    q_region_balance,
    q_user_burst_topk,
    q_vocab_coverage,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
MINUTE_US = 60_000_000


def _events_ts(ts_us, users=None):
    n = len(ts_us)
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts_us, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users or [1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_vocab_coverage_known(tmp_path):
    # 'a' x6, 'b' x3, 'c' x1 -> top10 covers all; coverage at k=10 = 1.0
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["a a a a a a b b b c"],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([19], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_vocab_coverage(str(tmp_path)).set_index("k")
    assert out.loc[10, "coverage"] == 1.0
    assert out.loc[10, "total_tokens"] == 10
    assert out.loc[100, "covered"] == 10


@pytest.mark.usefixtures("ray_session")
def test_user_burst_topk(tmp_path):
    # user 5 fires 4 events in one minute; user 1 spreads out
    ts = [T0 + i for i in range(4)] + [T0 + i * 2 * MINUTE_US for i in range(5)]
    users = [5] * 4 + [1] * 5
    pq.write_table(_events_ts(ts, users=users), tmp_path / "events.parquet")
    out = q_user_burst_topk(str(tmp_path))
    assert out.iloc[0]["user_id"] == 5
    assert out.iloc[0]["peak_per_minute"] == 4
    assert out.iloc[0]["total_events"] == 4
    assert out.iloc[1]["user_id"] == 1
    assert out.iloc[1]["peak_per_minute"] == 1


@pytest.mark.usefixtures("ray_session")
def test_region_balance(tmp_path):
    nation = pd.DataFrame(
        {
            "n_nationkey": np.array([0, 1], dtype=np.int32),
            "n_name": ["A", "B"],
            "n_regionkey": np.array([0, 0], dtype=np.int32),
        }
    )
    region = pd.DataFrame(
        {"r_regionkey": np.array([0], dtype=np.int32), "r_name": ["EUROPE"]}
    )
    cust = pd.DataFrame(
        {
            "c_custkey": np.array([1, 2], dtype=np.int64),
            "c_name": ["x", "y"],
            "c_nationkey": np.array([0, 1], dtype=np.int32),
            "c_acctbal": [10.0, 20.5],
            "c_mktsegment": ["BUILDING"] * 2,
        }
    )
    supp = pd.DataFrame(
        {
            "s_suppkey": np.array([1], dtype=np.int64),
            "s_name": ["s"],
            "s_nationkey": np.array([0], dtype=np.int32),
            "s_acctbal": [5.25],
        }
    )
    pq.write_table(pa.Table.from_pandas(nation), tmp_path / "nation.parquet")
    pq.write_table(pa.Table.from_pandas(region), tmp_path / "region.parquet")
    pq.write_table(pa.Table.from_pandas(cust), tmp_path / "customer.parquet")
    pq.write_table(pa.Table.from_pandas(supp), tmp_path / "supplier.parquet")
    out = q_region_balance(str(tmp_path))
    r = out.iloc[0]
    assert r["r_name"] == "EUROPE"
    assert r["n_customers"] == 2 and r["cust_balance_c"] == 3050
    assert r["n_suppliers"] == 1 and r["supp_balance_c"] == 525


@pytest.mark.usefixtures("ray_session")
def test_gap_autocorr_alternating(tmp_path):
    # alternating short/long gaps -> strong NEGATIVE lag-1 correlation
    gaps = [1_000_000 if i % 2 == 0 else 9_000_000 for i in range(40)]
    ts = np.concatenate(([T0], T0 + np.cumsum(gaps)))
    pq.write_table(_events_ts(ts.tolist()), tmp_path / "events.parquet")
    out = q_gap_autocorr(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_pairs"] == 39
    assert r["gap_autocorr"] < -0.9
