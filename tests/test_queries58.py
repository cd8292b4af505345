"""Kernel tests for pipelines/queries58.py — user intensity / embedding
dup rate known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries58 import (
    q_embedding_dup_rate,
    q_user_intensity_mean,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
DAY_US = 86_400_000_000


@pytest.mark.usefixtures("ray_session")
def test_user_intensity_mean(tmp_path):
    # user 1: 4 events over 2 days -> 2.0; user 2: 1 event over 1 day -> 1.0
    users = [1, 1, 1, 1, 2]
    days = [0, 0, 1, 1, 0]
    ts = [T0 + d * DAY_US + i for i, d in enumerate(days)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(users, pa.int64()),
            "event_type": pa.array(["view"] * 5),
            "value": pa.array([1.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_user_intensity_mean(str(tmp_path))
    r = out.iloc[0]
    assert r["n_users"] == 2
    assert r["mean_intensity"] == 1.5


@pytest.mark.usefixtures("ray_session")
def test_embedding_dup_rate(tmp_path):
    # vecs 0 and 1 identical; 2 distinct -> 1 duplicate of 4
    vecs = [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0], [0.5, 0.5]]
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
    out = q_embedding_dup_rate(str(tmp_path))
    r = out.iloc[0]
    assert r["n_vecs"] == 4
    assert r["n_distinct"] == 3
    assert r["n_duplicates"] == 1
    assert r["dup_rate"] == 0.25
