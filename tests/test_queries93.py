"""Kernel test for pipelines/queries93.py — cross-type proximity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries93 import q_cross_type_proximity


@pytest.mark.usefixtures("ray_session")
def test_cross_type_proximity(tmp_path):
    # a at t=0 and t=1h; b at t=2min. Only the first a-event has a b
    # within 5 minutes; the b-event has an a neighbor too.
    rows = [
        ("2024-01-01T00:00:00", "a"),
        ("2024-01-01T01:00:00", "a"),
        ("2024-01-01T00:02:00", "b"),
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.array([np.datetime64(t, "us") for t, _ in rows],
                           dtype="datetime64[us]"),
            "user_id": np.ones(3, dtype=np.int64),
            "event_type": [e for _, e in rows],
            "value": np.ones(3, dtype=np.float64),
            "props": ["{}"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_cross_type_proximity(str(tmp_path)).set_index(
        ["type_a", "type_b"]
    )
    assert out.loc[("a", "b"), "n_a_events"] == 2
    assert out.loc[("a", "b"), "n_with_neighbor"] == 1
    assert out.loc[("a", "b"), "share"] == 0.5
    assert out.loc[("b", "a"), "n_with_neighbor"] == 1
    assert out.loc[("b", "a"), "share"] == 1.0
