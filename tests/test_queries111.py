"""Kernel test for pipelines/queries111.py — sentence length CV."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries111 import q_sentence_len_cv


@pytest.mark.usefixtures("ray_session")
def test_sentence_len_cv(tmp_path):
    # sentences: 2 words and 4 words -> mean 3, pop sd 1, cv = 1/3
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(1, dtype=np.int64),
            "text": ["two words. four words are here."],
            "lang": ["en"],
            "source": ["s1"],
            "n_chars": np.array([32], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_sentence_len_cv(str(tmp_path))
    r = out.iloc[0]
    assert r["n_sentences"] == 2
    assert r["mean_words"] == 3.0
    assert r["cv"] == round(1.0 / 3.0, 6)
