"""Kernel test for pipelines/queries82.py — value skew/kurtosis known
answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries82 import q_value_skew_kurtosis


@pytest.mark.usefixtures("ray_session")
def test_value_skew_kurtosis_symmetric(tmp_path):
    # symmetric values {1, 2, 3}: skew 0; kurtosis of the 3-point
    # uniform = m4/m2^2 - 3 = (2/3*...)  m2 = 2/3 c^2 ... compute:
    # cents {100,200,300}: m=200, m2=(100^2+0+100^2)/3=6666.66,
    # m4=(100^4+0+100^4)/3, kurt = m4/m2^2 - 3 = 1.5 - 3 = -1.5
    vals = [1.0, 2.0, 3.0]
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
    out = q_value_skew_kurtosis(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_events"] == 3
    assert r["skewness"] == 0.0
    assert r["kurtosis_excess"] == -1.5
