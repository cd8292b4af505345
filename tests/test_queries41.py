"""Kernel tests for pipelines/queries41.py — flatline runs / first token /
top variance dims known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries41 import (
    q_first_token_topk,
    q_flatline_runs,
    q_top_variance_dims,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000


@pytest.mark.usefixtures("ray_session")
def test_flatline_runs(tmp_path):
    # counts: 5,5,5,5, 2, 3,3, 7 -> max flatline 4, runs>=3: one
    counts = [5, 5, 5, 5, 2, 3, 3, 7]
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
    out = q_flatline_runs(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_hours"] == 8
    assert r["max_flatline_h"] == 4
    assert r["n_flat_runs_3plus"] == 1


@pytest.mark.usefixtures("ray_session")
def test_first_token_topk(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(4, dtype=np.int64),
            "text": ["the cat", "the dog", "a mouse", ""],
            "lang": ["en"] * 4,
            "source": ["web"] * 4,
            "n_chars": np.array([7, 7, 7, 0], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_first_token_topk(str(tmp_path))
    assert out.iloc[0]["token"] == "the"
    assert out.iloc[0]["n_docs"] == 2
    # 3 docs have tokens -> share 2/3
    assert out.iloc[0]["share"] == round(2.0 / 3.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_top_variance_dims(tmp_path):
    # dim 1 varies (+/-1 after quantization); dim 0 constant
    vecs = [[1.0, 1.0], [1.0, -1.0], [1.0, 1.0], [1.0, -1.0]]
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
    out = q_top_variance_dims(str(tmp_path))
    assert out.iloc[0]["dim"] == 1
    assert out.iloc[0]["var_q"] == 127.0 * 127.0  # +/-127, mean 0
    assert out.iloc[1]["dim"] == 0
    assert out.iloc[1]["var_q"] == 0.0
