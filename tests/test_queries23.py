"""Kernel tests for pipelines/queries23.py — CH score / gap lognormal /
dow chi2 / part-size price known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries23 import (
    q_calinski_harabasz,
    q_chi2_day_of_week,
    q_gap_lognormal,
    q_part_size_price,
)

T0 = pd.Timestamp("2024-01-01").value // 1000  # a Monday
DAY_US = 86_400_000_000
D = lambda s: np.datetime64(s, "us")


def _events(n, gaps_us=None, days=None):
    if gaps_us is not None:
        ts = np.concatenate(([T0], T0 + np.cumsum(gaps_us))).astype(np.int64)
    else:
        ts = np.array(
            [T0 + (days[i] if days else 0) * DAY_US + i for i in range(n)],
            dtype=np.int64,
        )
    m = len(ts)
    return pa.table(
        {
            "event_id": pa.array(range(m), pa.int64()),
            "ts": pa.array(ts.astype("datetime64[us]")),
            "user_id": pa.array([1] * m, pa.int64()),
            "event_type": pa.array(["view"] * m),
            "value": pa.array([1.0] * m, pa.float64()),
            "props": pa.array(["{}"] * m),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_calinski_harabasz_separated_clusters(tmp_path):
    # two tight, well-separated clusters -> W ~ 0 is impossible (identical
    # vectors -> W = 0 exactly, CH = inf) so perturb one vector slightly
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.9, 0.1], [0.0, 1.0], [0.0, 1.0],
            [0.1, 0.9]]
    labels = [0, 0, 0, 1, 1, 1]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(6), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array(labels, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = q_calinski_harabasz(str(tmp_path))
    r = out.iloc[0]
    assert r["n_vecs"] == 6 and r["n_labels"] == 2
    assert r["between_ss"] > r["within_ss"]
    assert r["ch_score"] > 10


@pytest.mark.usefixtures("ray_session")
def test_gap_lognormal_constant_gaps(tmp_path):
    gap = 2_000_000  # 2 s
    pq.write_table(
        _events(0, gaps_us=np.full(50, gap)), tmp_path / "events.parquet"
    )
    out = q_gap_lognormal(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_gaps"] == 50
    assert r["ln_mu"] == round(math.log(gap), 6)
    assert r["ln_sigma"] == 0.0
    assert r["median_est_us"] == float(gap)


@pytest.mark.usefixtures("ray_session")
def test_chi2_dow_uniform_is_zero(tmp_path):
    # one event on each of 7 consecutive days -> chi2 = 0
    pq.write_table(_events(7, days=list(range(7))), tmp_path / "events.parquet")
    out = q_chi2_day_of_week(str(tmp_path))
    r = out.iloc[0]
    assert r["n_events"] == 7
    assert r["chi2"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_part_size_price(tmp_path):
    part = pd.DataFrame(
        {
            "p_partkey": np.arange(3, dtype=np.int64),
            "p_name": ["a", "b", "c"],
            "p_brand": ["B"] * 3,
            "p_type": ["T"] * 3,
            "p_size": np.array([1, 1, 2], dtype=np.int32),
            "p_retailprice": [10.0, 20.0, 30.0],
        }
    )
    pq.write_table(pa.Table.from_pandas(part), tmp_path / "part.parquet")
    out = q_part_size_price(str(tmp_path)).set_index("size")
    assert out.loc[1, "n_parts"] == 2
    assert out.loc[1, "mean_price"] == 15.0
    assert out.loc[1, "min_price_c"] == 1000
    assert out.loc[2, "max_price_c"] == 3000
