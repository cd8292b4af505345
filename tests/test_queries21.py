"""Kernel tests for pipelines/queries21.py — variogram / centroid
separation / cadence / Bowley known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries21 import (
    q_bowley_skew,
    q_centroid_separation,
    q_repeat_cadence,
    q_variogram,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000
D = lambda s: np.datetime64(s, "us")


def _events_by_hour(counts, values=None):
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    n = len(hours)
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array(values or [1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_variogram_alternating(tmp_path):
    # alternating 1,3,1,3...: |diff| = 2 at odd lags, 0 at even lags
    counts = [1 if i % 2 == 0 else 3 for i in range(48)]
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_variogram(str(tmp_path))
    df = (out if isinstance(out, pd.DataFrame) else out.to_pandas()).set_index("lag")
    assert df.loc[1, "gamma"] == 1.0   # 2 / 2
    assert df.loc[2, "gamma"] == 0.0
    assert df.loc[24, "gamma"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_centroid_separation_two_clusters(tmp_path):
    # labels at opposite corners; quantization maps to +-127 exactly
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.0, 1.0]]
    labels = [0, 0, 1, 1]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = q_centroid_separation(str(tmp_path))
    r = out.iloc[0]
    assert r["label_i"] == 0 and r["label_j"] == 1
    assert r["n_i"] == 2 and r["n_j"] == 2
    # centroids (127,0) and (0,127): dist = 127*sqrt(2)
    assert abs(r["dist_q"] - 127.0 * np.sqrt(2.0)) < 1e-4


@pytest.mark.usefixtures("ray_session")
def test_repeat_cadence_known(tmp_path):
    # cust 1: orders at days 0, 10, 30 -> gaps 10, 20 -> median 10
    # cust 2: orders at days 0, 7 -> median 7
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(5, dtype=np.int64),
            "o_custkey": np.array([1, 1, 1, 2, 2], dtype=np.int64),
            "o_orderstatus": ["O"] * 5,
            "o_totalprice": [1.0] * 5,
            "o_orderdate": [D("1995-01-01"), D("1995-01-11"), D("1995-01-31"),
                            D("1995-03-01"), D("1995-03-08")],
            "o_orderpriority": ["1-URGENT"] * 5,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_repeat_cadence(str(tmp_path)).set_index("median_gap_d")
    assert out.loc[10, "n_customers"] == 1
    assert out.loc[7, "n_customers"] == 1


@pytest.mark.usefixtures("ray_session")
def test_bowley_skew_symmetric(tmp_path):
    # values 1..100 uniform -> quartiles 25/50/75 -> bowley 0
    pq.write_table(
        _events_by_hour([100], values=[float(i) for i in range(1, 101)]),
        tmp_path / "events.parquet",
    )
    out = q_bowley_skew(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["q1_c"] == 2500 and r["q2_c"] == 5000 and r["q3_c"] == 7500
    assert r["bowley"] == 0.0
