"""Kernel tests for pipelines/queries162.py — median polish and
PageRank over the nation trade graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_median_polish_constant_row(tmp_path):
    """All 24 hours of one Monday at count 3: that row's effect is 3,
    every residual 0 (zeros elsewhere are genuine cells)."""
    from signalsharp_ray.pipelines.queries162 import q_median_polish_dow_hour

    hours = pd.date_range("2024-01-01", periods=24, freq="1h")  # a Monday
    ts = np.repeat(hours, 3)
    n = len(ts)
    df = pd.DataFrame(
        {
            "ts": pd.DatetimeIndex(ts),
            "event_id": np.arange(n, dtype=np.int64),
            "event_type": "click",
            "user_id": np.zeros(n, dtype=np.int64),
            "value": np.ones(n),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_median_polish_dow_hour(str(tmp_path))
    assert len(out) == 168
    monday = out[out["dow"] == 1]  # DuckDB dayofweek: Sunday=0
    assert (monday["n_events"] == 3).all()
    assert (monday["row_effect"] == 3.0).all()
    np.testing.assert_allclose(monday["residual"].to_numpy(), 0.0)
    np.testing.assert_allclose(out["col_effect"].to_numpy(), 0.0)


@pytest.mark.usefixtures("ray_session")
def test_pagerank_nation_flows_small_graph(tmp_path):
    """Two nations with asymmetric flows: PageRank matches a direct
    replay of the damped iteration."""
    from signalsharp_ray.pipelines.queries162 import q_pagerank_nation_flows

    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "n_nationkey": np.array([0, 1], dtype=np.int64),
                    "n_name": ["ALPHA", "BETA"],
                    "n_regionkey": np.zeros(2, dtype=np.int64),
                }
            )
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "s_suppkey": np.array([1, 2], dtype=np.int64),
                    "s_nationkey": np.array([0, 1], dtype=np.int64),
                }
            )
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "c_custkey": np.array([1, 2], dtype=np.int64),
                    "c_nationkey": np.array([1, 0], dtype=np.int64),
                }
            )
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "o_orderkey": np.array([10, 20], dtype=np.int64),
                    "o_custkey": np.array([1, 2], dtype=np.int64),
                }
            )
        ),
        tmp_path / "orders.parquet",
    )
    # 3 items ALPHA->BETA (order 10, supp 1), 1 item BETA->ALPHA
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "l_orderkey": np.array([10, 10, 10, 20], dtype=np.int64),
                    "l_suppkey": np.array([1, 1, 1, 2], dtype=np.int64),
                    "l_extendedprice": np.array([10.0, 20.0, 30.0, 40.0]),
                    "l_discount": np.zeros(4),
                }
            )
        ),
        tmp_path / "lineitem.parquet",
    )
    out = (
        q_pagerank_nation_flows(str(tmp_path))
        .sort_values("nation")
        .reset_index(drop=True)
    )
    assert list(out["nation"]) == ["ALPHA", "BETA"]
    # direct replay: P = [[0,1],[1,0]] (each nation ships only to the
    # other), no dangling
    r = np.array([0.5, 0.5])
    for _ in range(10):
        r = 0.15 / 2 + 0.85 * np.array([r[1], r[0]])
    np.testing.assert_allclose(
        out["pagerank"].to_numpy(), r, atol=1e-6
    )
    assert out["pagerank"].sum() == pytest.approx(1.0, abs=1e-6)
