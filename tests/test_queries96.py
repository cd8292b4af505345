"""Kernel test for pipelines/queries96.py — prefix dup share."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries96 import q_prefix_dup_share


@pytest.mark.usefixtures("ray_session")
def test_prefix_dup_share(tmp_path):
    boiler = "x" * 32
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(3, dtype=np.int64),
            "text": [boiler + " tail one", boiler + " tail two", "unique doc"],
            "lang": ["en"] * 3,
            "source": ["s1", "s1", "s1"],
            "n_chars": np.array([41, 41, 10], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_prefix_dup_share(str(tmp_path))
    r = out.iloc[0]
    assert r["n_docs"] == 3
    assert r["n_shared_prefix"] == 2
    assert r["shared_share"] == round(2.0 / 3.0, 6)
