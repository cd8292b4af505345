"""Kernel test for pipelines/queries85.py — sentence dup rate known
answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries85 import q_sentence_dup_rate


@pytest.mark.usefixtures("ray_session")
def test_sentence_dup_rate(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": [
                "Hello world. Hello world. Bye now.",  # 3 sents, 1 dup
                "Unique one. Unique two.",  # 2 sents, 0 dup
            ],
            "lang": ["en", "en"],
            "source": ["s1", "s1"],
            "n_chars": np.array([34, 23], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_sentence_dup_rate(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_docs"] == 2
    assert r["n_sentences"] == 5
    assert r["n_duplicates"] == 1
    assert r["mean_dup_rate"] == round((1.0 / 3.0 + 0.0) / 2.0, 6)
