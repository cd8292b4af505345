"""Kernel test for pipelines/queries103.py — pairwise KS known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries103 import q_value_ks_pairs


@pytest.mark.usefixtures("ray_session")
def test_value_ks_pairs(tmp_path):
    # type a: values {1, 2}; type b: values {3, 4} -> disjoint: D = 1
    rows = [("a", 1.0), ("a", 2.0), ("b", 3.0), ("b", 4.0)]
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")] * 4,
                dtype="datetime64[us]",
            ),
            "user_id": np.ones(4, dtype=np.int64),
            "event_type": [t for t, _ in rows],
            "value": [v for _, v in rows],
            "props": ["{}"] * 4,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_value_ks_pairs(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_a"] == 2 and r["n_b"] == 2
    assert r["ks_d"] == 1.0
