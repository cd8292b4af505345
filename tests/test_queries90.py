"""Kernel test for pipelines/queries90.py — value mode known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries90 import q_value_mode_by_type


@pytest.mark.usefixtures("ray_session")
def test_value_mode_by_type(tmp_path):
    # values: 2.5 x3, 7.0 x1 -> mode 2.5 with share 0.75
    vals = [2.5, 2.5, 2.5, 7.0]
    n = len(vals)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(
                [np.datetime64("2024-01-01T00:00:00", "us")] * n,
                dtype="datetime64[us]",
            ),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": vals,
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_value_mode_by_type(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["modal_value"] == 2.5
    assert r["n_modal"] == 3
    assert r["modal_share"] == 0.75
