"""Kernel test for pipelines/queries77.py — trimmed mean known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries77 import q_trimmed_mean_value


@pytest.mark.usefixtures("ray_session")
def test_trimmed_mean_known(tmp_path):
    # 10 values 1..9 plus outlier 1000: k = 1 -> drop min (1) and max
    # (1000); trimmed mean = (2+..+9)/8 = 5.5; raw mean = 104.5.
    vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 1000.0]
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
    out = q_trimmed_mean_value(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_events"] == 10
    assert r["n_trimmed"] == 2
    assert r["mean_value"] == 104.5
    assert r["trimmed_mean"] == 5.5
