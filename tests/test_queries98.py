"""Kernel test for pipelines/queries98.py — type switch rate."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries98 import q_type_switch_rate


@pytest.mark.usefixtures("ray_session")
def test_type_switch_rate(tmp_path):
    # one user: a a b -> transitions (a->a no switch), (a->b switch)
    # to-type mix: {a: 1, b: 1} -> expected = 1 - 0.5 = 0.5
    ts = [np.datetime64("2024-01-01T00:00:00", "us") + np.timedelta64(i, "m")
          for i in range(3)]
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(3, dtype=np.int64),
            "event_type": ["a", "a", "b"],
            "value": np.ones(3, dtype=np.float64),
            "props": ["{}"] * 3,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_type_switch_rate(str(tmp_path))
    r = out.iloc[0]
    assert r["n_transitions"] == 2
    assert r["switch_rate"] == 0.5
    assert r["expected_rate"] == 0.5
    assert r["stickiness"] == 1.0
