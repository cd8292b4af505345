"""Kernel test for pipelines/queries75.py — props-value correlation
known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries75 import q_props_value_corr


@pytest.mark.usefixtures("ray_session")
def test_props_value_corr_perfect(tmp_path):
    # value = k exactly -> r = 1; one malformed props row drops.
    ks = [1, 2, 3, 4]
    df = pd.DataFrame(
        {
            "event_id": np.arange(5, dtype=np.int64),
            "ts": np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")] * 5,
                dtype="datetime64[us]",
            ),
            "user_id": np.ones(5, dtype=np.int64),
            "event_type": ["a"] * 5,
            "value": [1.0, 2.0, 3.0, 4.0, 99.0],
            "props": ['{"k": 1}', '{"k": 2}', '{"k": 3}', '{"k": 4}', "{}"],
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_props_value_corr(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_events"] == 4
    assert r["r"] == 1.0
