"""Kernel test for pipelines/queries108.py — embedding sparsity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries108 import q_embedding_sparsity


@pytest.mark.usefixtures("ray_session")
def test_embedding_sparsity(tmp_path):
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(2, dtype=np.int64),
            "embedding": [
                np.array([0.0, 1.0], dtype=np.float32),
                np.array([0.0, 0.0], dtype=np.float32),
            ],
            "label": np.zeros(2, dtype=np.int32),
        }
    )
    pq.write_table(pa.Table.from_pandas(emb), tmp_path / "embeddings.parquet")
    out = q_embedding_sparsity(str(tmp_path))
    r = out.iloc[0]
    assert r["n_components"] == 4
    assert r["n_zero"] == 3
    assert r["zero_share"] == 0.75
