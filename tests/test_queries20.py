"""Kernel tests for pipelines/queries20.py — Lorenz deciles / supplier
HHI / conditional entropy / PACF known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries20 import (
    q_char_cond_entropy,
    q_lorenz_deciles,
    q_pacf,
    q_supplier_hhi,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000
D = lambda s: np.datetime64(s, "us")


def _events_users(values, users):
    n = len(values)
    ts = [T0 + i * 1000 for i in range(n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["buy"] * n),
            "value": pa.array([float(v) for v in values], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_lorenz_deciles_uniform(tmp_path):
    # 10 users each with distinct spend 1..10 dollars -> one user per decile
    pq.write_table(
        _events_users([float(i) for i in range(1, 11)], list(range(1, 11))),
        tmp_path / "events.parquet",
    )
    out = q_lorenz_deciles(str(tmp_path))
    assert len(out) == 10
    assert (out["n_users"] == 1).all()
    assert out["cum_share"].iloc[-1] == 1.0
    # poorest decile = 1/55 of spend
    assert out.iloc[0]["cum_share"] == round(1.0 / 55.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_supplier_hhi_monopoly_vs_even(tmp_path):
    li = pd.DataFrame(
        {
            "l_orderkey": np.arange(3, dtype=np.int64),
            "l_partkey": np.ones(3, dtype=np.int64),
            "l_suppkey": np.array([1, 2, 3], dtype=np.int64),
            "l_linenumber": np.ones(3, dtype=np.int32),
            "l_quantity": [1.0] * 3,
            "l_extendedprice": [100.0, 50.0, 50.0],
            "l_discount": [0.0] * 3,
            "l_tax": [0.0] * 3,
            "l_returnflag": ["N"] * 3,
            "l_linestatus": ["O"] * 3,
            "l_shipdate": [D("1995-01-05")] * 3,
        }
    )
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
            "s_name": ["S1", "S2", "S3"],
            "s_nationkey": np.array([0, 1, 1], dtype=np.int32),
            "s_acctbal": [0.0] * 3,
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.array([0, 1], dtype=np.int32),
            "n_name": ["MONO", "DUO"],
            "n_regionkey": np.array([0, 0], dtype=np.int32),
        }
    )
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    pq.write_table(pa.Table.from_pandas(supplier), tmp_path / "supplier.parquet")
    pq.write_table(pa.Table.from_pandas(nation), tmp_path / "nation.parquet")
    out = q_supplier_hhi(str(tmp_path))
    df = (out if isinstance(out, pd.DataFrame) else out.to_pandas()).set_index(
        "n_name"
    )
    assert df.loc["MONO", "hhi"] == 1.0
    assert df.loc["DUO", "hhi"] == 0.5  # two equal suppliers


@pytest.mark.usefixtures("ray_session")
def test_char_cond_entropy_deterministic_chain(tmp_path):
    # "ababab...": next char fully determined by current -> cond entropy 0
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1], dtype=np.int64),
            "text": ["ab" * 50],
            "lang": ["en"],
            "source": ["web"],
            "n_chars": np.array([100], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_char_cond_entropy(str(tmp_path))
    r = out.iloc[0]
    assert r["n_bigrams"] == 99
    assert r["cond_entropy"] == 0.0
    assert r["perplexity"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_pacf_ar1_signature(tmp_path):
    # AR(1)-like exponentially smoothed ramp: pacf1 large, pacf2/3 small
    rng = np.random.RandomState(7)
    x = np.zeros(240)
    for i in range(1, 240):
        x[i] = 0.8 * x[i - 1] + rng.randint(0, 5)
    counts = np.maximum(1, x.astype(int))
    hours = [h for h, c in enumerate(counts) for _ in range(int(c))]
    n = len(hours)
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_pacf(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["pacf1"] > 0.5
    assert abs(r["pacf2"]) < r["pacf1"]
    assert abs(r["pacf3"]) < r["pacf1"]
