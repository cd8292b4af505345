"""Kernel tests for pipelines/queries15.py — Page-Hinkley / EWMA control /
readability / embedding covariance known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries15 import (
    q_embedding_covariance,
    q_ewma_control,
    q_page_hinkley,
    q_readability,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000


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
def test_page_hinkley_flat_no_alarm(tmp_path):
    # constant load: every term = -delta, m strictly decreasing -> m == mmin
    pq.write_table(_events_by_hour([7] * 10), tmp_path / "events.parquet")
    out = q_page_hinkley(str(tmp_path))
    r = out.iloc[0]
    assert r["n_hours"] == 10
    assert r["n_alarms"] == 0
    assert r["ph_final"] == r["ph_min"] == -50.0  # 10 * -5.0


@pytest.mark.usefixtures("ray_session")
def test_page_hinkley_step_alarm(tmp_path):
    # long low regime then a big step: PH must rise above its min by >lambda
    pq.write_table(
        _events_by_hour([5] * 48 + [200] * 24), tmp_path / "events.parquet"
    )
    out = q_page_hinkley(str(tmp_path))
    assert out.iloc[0]["n_alarms"] > 0


@pytest.mark.usefixtures("ray_session")
def test_ewma_control_step_violations(tmp_path):
    counts = [10] * 48 + [100] * 24
    pq.write_table(_events_by_hour(counts), tmp_path / "events.parquet")
    out = q_ewma_control(str(tmp_path))
    r = out.iloc[0]
    assert r["n_hours"] == 72
    assert r["n_violations"] > 0
    # z_final approaches the high regime
    assert r["z_final"] > 50


@pytest.mark.usefixtures("ray_session")
def test_readability_known_counts(tmp_path):
    # 1 doc: 4 words, 2 sentences, vowel groups of lowercase text
    text = "Hello world. Nice day!"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([1], pa.int64()),
                "text": pa.array([text]),
                "lang": pa.array(["en"]),
                "source": pa.array(["web"]),
                "n_chars": pa.array([len(text)], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = q_readability(str(tmp_path))
    r = out.iloc[0]
    assert r["n_words"] == 4
    assert r["n_sentences"] == 2
    # hello(e,o) world(o) nice(i,e) day(ay) -> 6 vowel groups
    assert r["n_syllables"] == 6
    expect = 206.835 - 1.015 * (4.0 / 2.0) - 84.6 * (6.0 / 4.0)
    assert r["flesch"] == round(expect, 6)


@pytest.mark.usefixtures("ray_session")
def test_embedding_covariance_identity(tmp_path):
    # two orthogonal constant dims: var(dim0)=0.25, cov(0,1)=-0.25
    vecs = [[1.0, 0.0], [0.0, 1.0], [1.0, 0.0], [0.0, 1.0]]
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(4), pa.int64()),
                "embedding": pa.array(vecs, pa.list_(pa.float32())),
                "label": pa.array([0] * 4, pa.int32()),
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = q_embedding_covariance(str(tmp_path)).set_index(["dim_i", "dim_j"])
    assert out.loc[(0, 0), "cov"] == 0.25
    assert out.loc[(0, 1), "cov"] == -0.25
    assert out.loc[(1, 1), "cov"] == 0.25
    assert (out["n_vecs"] == 4).all()
