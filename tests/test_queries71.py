"""Kernel test for pipelines/queries71.py — KS-vs-uniform known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries71 import q_ks_uniform_hod


@pytest.mark.usefixtures("ray_session")
def test_ks_uniform_hod_known(tmp_path):
    # All 6 events in hour 0 of one day: ecdf jumps to 1 at h=0,
    # uniform cdf is 1/24 -> D = 23/24, worst hour 0.
    ts = [np.datetime64("2024-01-01T00:10:00", "us") + np.timedelta64(j, "s")
          for j in range(6)]
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(ts, dtype="datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": np.ones(n, dtype=np.float64),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_ks_uniform_hod(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_events"] == 6
    assert r["worst_hour"] == 0
    assert r["ks_d"] == round(23.0 / 24.0, 6)
