"""Kernel tests for pipelines/queries27.py — 1-NN LOO accuracy /
volatility clustering / doc-length Gini known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries27 import (
    q_doclen_gini,
    q_knn_loo_accuracy,
    q_volatility_clustering,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
def test_knn_loo_accuracy_separable(tmp_path):
    # two tight clusters with consistent labels -> accuracy 1.0
    vecs = [[1.0, 0.0], [0.9, 0.1], [1.0, 0.1],
            [0.0, 1.0], [0.1, 0.9], [0.1, 1.0]]
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
    out = q_knn_loo_accuracy(str(tmp_path))
    r = out.iloc[0]
    assert r["n_vecs"] == 6
    assert r["n_correct"] == 6
    assert r["accuracy"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_volatility_clustering_regimes(tmp_path):
    # calm stretch then violent alternation: squared deltas cluster ->
    # strongly positive lag-1 autocorrelation
    counts = []
    level = 50
    for i in range(96):
        if i < 48:
            level += 1 if i % 2 == 0 else -1  # calm: |d| = 1
        else:
            level += 30 if i % 2 == 0 else -30  # violent: |d| = 30
        counts.append(max(1, level))
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    ts = [T0 + h * HOUR_US + i for i, h in enumerate(hours)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(ts)), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * len(ts), pa.int64()),
            "event_type": pa.array(["view"] * len(ts)),
            "value": pa.array([1.0] * len(ts), pa.float64()),
            "props": pa.array(["{}"] * len(ts)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_volatility_clustering(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    assert df.iloc[0]["vol_autocorr"] > 0.5


@pytest.mark.usefixtures("ray_session")
def test_doclen_gini_equal_is_zero(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["x" * 50] * 4,
            "lang": ["en"] * 4,
            "source": ["web"] * 4,
            "n_chars": np.full(4, 50, dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_doclen_gini(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["gini_num"] == 0
    assert r["gini"] == 0.0
