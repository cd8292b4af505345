"""Kernel test for pipelines/queries78.py — label confusion known
answer on a hand-built embedding table."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries78 import q_label_confusion_rate


@pytest.mark.usefixtures("ray_session")
def test_label_confusion_known(tmp_path):
    # label 0 centroid ~ (0,0) except one defector at (10,10);
    # label 1 centroid ~ (10,10). The defector is closer to label 1.
    vecs = [
        ([0.0, 0.0], 0),
        ([0.1, -0.1], 0),
        ([10.0, 10.0], 0),  # defector
        ([10.0, 10.0], 1),
        ([9.9, 10.1], 1),
    ]
    emb = pd.DataFrame(
        {
            "vec_id": np.arange(len(vecs), dtype=np.int64),
            "embedding": [np.array(v, dtype=np.float32) for v, _ in vecs],
            "label": np.array([l for _, l in vecs], dtype=np.int32),
        }
    )
    pq.write_table(pa.Table.from_pandas(emb), tmp_path / "embeddings.parquet")
    out = q_label_confusion_rate(str(tmp_path)).set_index("label")
    assert out.loc[0, "n_vecs"] == 3
    assert out.loc[0, "n_confused"] == 1
    assert out.loc[0, "confusion_rate"] == round(1.0 / 3.0, 6)
    assert out.loc[1, "n_confused"] == 0
