"""Kernel tests for pipelines/queries68.py — sentence stats and cosine
pair histogram known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries68 import (
    q_cosine_pair_histogram,
    q_sentence_length_stats,
)


@pytest.mark.usefixtures("ray_session")
def test_sentence_length_stats_known(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": ["One two. Three!  ", "Solo sentence here?!? Tail"],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
            "n_chars": np.array([17, 26], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_sentence_length_stats(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    # sentences: "one two"(2), "three"(1), "solo sentence here"(3), "tail"(1)
    assert r["n_sentences"] == 4
    assert r["n_words"] == 7
    assert r["max_words"] == 3
    assert r["mean_words"] == round(7.0 / 4.0, 6)


@pytest.mark.usefixtures("ray_session")
def test_cosine_pair_histogram_known(tmp_path):
    # 4 vectors -> h=2: pair (0,2) identical -> cos 1.0 (bucket 9);
    # pair (1,3) orthogonal -> cos 0.0 (bucket 0).
    vecs = [
        [1.0, 0.0],
        [0.5, 0.5],
        [2.0, 0.0],
        [-0.5, 0.5],
    ]
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(4, dtype=np.int64),
            "embedding": [np.array(v, dtype=np.float32) for v in vecs],
            "label": np.zeros(4, dtype=np.int32),
        }
    )
    pq.write_table(pa.Table.from_pandas(emb), tmp_path / "embeddings.parquet")
    out = (
        q_cosine_pair_histogram(str(tmp_path))
        .to_pandas()
        .set_index("bucket")
        .sort_index()
    )
    assert list(out.index) == [0, 9]
    assert out.loc[9, "n_pairs"] == 1
    assert out.loc[9, "mean_cos"] == 1.0
    assert out.loc[0, "n_pairs"] == 1
    assert out.loc[0, "mean_cos"] == 0.0
