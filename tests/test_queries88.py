"""Kernel test for pipelines/queries88.py — sentence overlap known
answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries88 import q_sentence_overlap_sources


@pytest.mark.usefixtures("ray_session")
def test_sentence_overlap_sources(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": [
                "Shared sentence. Only in one.",
                "Shared sentence! Unique tail here.",
            ],
            "lang": ["en", "en"],
            "source": ["s1", "s2"],
            "n_chars": np.array([29, 34], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_sentence_overlap_sources(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["n_shared"] == 1
    assert r["jaccard"] == round(1.0 / 3.0, 6)
