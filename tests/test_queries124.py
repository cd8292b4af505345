"""Kernel tests for pipelines/queries124.py — DB index on separable
clusters, silhouette sign behavior, hubness degree conservation, and
norm-histogram bucketing."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(tmp_path, vecs, labels):
    df = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.asarray(v, dtype=np.float32) for v in vecs],
            "label": np.asarray(labels, dtype=np.int32),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "embeddings.parquet")


def _two_blobs():
    rng = np.random.RandomState(7)
    a = rng.normal(0, 0.05, (20, 8)) + np.array([1.0] + [0.0] * 7)
    b = rng.normal(0, 0.05, (20, 8)) + np.array([0.0] * 7 + [1.0])
    return np.vstack([a, b]), [0] * 20 + [1] * 20


@pytest.mark.usefixtures("ray_session")
def test_davies_bouldin_low_for_separated_blobs(tmp_path):
    from signalsharp_ray.pipelines.queries124 import q_davies_bouldin

    vecs, labels = _two_blobs()
    _write_embeddings(tmp_path, vecs, labels)
    out = q_davies_bouldin(str(tmp_path))
    assert len(out) == 2
    assert (out["n_vecs"] == 20).all()
    # well-separated tight blobs: DB well under 1
    assert out["db_index"].iloc[0] < 1.0
    assert (out["scatter"] > 0).all()


@pytest.mark.usefixtures("ray_session")
def test_silhouette_positive_for_separated_blobs(tmp_path):
    from signalsharp_ray.pipelines.queries124 import q_silhouette_simplified

    vecs, labels = _two_blobs()
    _write_embeddings(tmp_path, vecs, labels)
    out = q_silhouette_simplified(str(tmp_path)).to_pandas()
    assert len(out) == 40
    assert (out["silhouette"] > 0.5).all()  # every point fits its blob
    assert (out["a_dist"] < out["b_dist"]).all()


@pytest.mark.usefixtures("ray_session")
def test_hubness_degrees_conserve_total(tmp_path):
    from signalsharp_ray.pipelines.queries124 import HUB_K, q_hubness

    rng = np.random.RandomState(3)
    vecs = rng.normal(0, 1, (30, 8))
    _write_embeddings(tmp_path, vecs, [0] * 30)
    out = q_hubness(str(tmp_path))
    assert len(out) == 30
    # every query hands out exactly K votes
    assert out["in_degree"].sum() == 30 * HUB_K
    assert out["in_degree"].min() >= 0


@pytest.mark.usefixtures("ray_session")
def test_norm_histogram_buckets_exact(tmp_path):
    from signalsharp_ray.pipelines.queries124 import (
        NORM_BUCKET,
        q_embedding_norm_histogram,
    )

    # one-hot vectors quantize to a single 127 component: norm2 = 16129
    vecs = np.eye(4, 8)
    _write_embeddings(tmp_path, vecs, [0, 0, 1, 1])
    out = q_embedding_norm_histogram(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["bucket"] == 16129 // NORM_BUCKET
    assert out.iloc[0]["n_vecs"] == 4
    assert out.iloc[0]["min_norm2"] == 16129
    assert out.iloc[0]["max_norm2"] == 16129
