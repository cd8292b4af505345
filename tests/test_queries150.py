"""Kernel test for pipelines/queries150.py — vocabulary Jaccard on a
constructed overlap."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_vocab_jaccard(tmp_path):
    from signalsharp_ray.pipelines.queries150 import q_vocab_jaccard_sources

    # s0 vocab {aa,bb,cc}, s1 vocab {bb,cc,dd,ee}: shared 2, union 5
    texts = ["aa bb cc aa", "bb cc dd ee bb"]
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2, dtype=np.int64),
            "text": texts,
            "lang": "en",
            "source": ["s0", "s1"],
            "n_chars": np.array([len(t) for t in texts], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = q_vocab_jaccard_sources(str(tmp_path))
    r = out.iloc[0]
    assert (r["source_a"], r["source_b"]) == ("s0", "s1")
    assert r["n_shared"] == 2 and r["vocab_a"] == 3 and r["vocab_b"] == 4
    assert r["jaccard"] == pytest.approx(0.4)
