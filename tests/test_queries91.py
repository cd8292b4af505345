"""Kernel test for pipelines/queries91.py — first/last matrix."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries91 import q_user_first_last_matrix


@pytest.mark.usefixtures("ray_session")
def test_user_first_last_matrix(tmp_path):
    # user 1: a ... b ; user 2: only c -> (a,b) and (c,c)
    rows = [
        ("2024-01-01T00:00:00", 1, "a"),
        ("2024-01-02T00:00:00", 1, "b"),
        ("2024-01-01T12:00:00", 2, "c"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.array([np.datetime64(t, "us") for t, _, _ in rows],
                           dtype="datetime64[us]"),
            "user_id": np.array([u for _, u, _ in rows], dtype=np.int64),
            "event_type": [e for _, _, e in rows],
            "value": np.ones(3, dtype=np.float64),
            "props": ["{}"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_user_first_last_matrix(str(tmp_path)).set_index(
        ["first_type", "last_type"]
    )
    assert out.loc[("a", "b"), "n_users"] == 1
    assert out.loc[("c", "c"), "n_users"] == 1
    assert out.loc[("a", "b"), "share"] == 0.5
