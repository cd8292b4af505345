"""Pipeline test for pipelines/queries151.py — BOCD over a constructed
events table whose hourly-bucket square wave has known flip indices."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_bocd_changepoints_pipeline(tmp_path):
    from signalsharp_ray.pipelines.queries151 import q_bocd_changepoints

    # 100 distinct hours for one event_type -> flips at 40 and 80.
    ts = pd.date_range("2024-01-01", periods=100, freq="1h").repeat(2)
    df = pd.DataFrame(
        {
            "ts": ts,
            "event_type": "click",
            "user_id": np.arange(200, dtype=np.int64),
            "value": np.ones(200),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_bocd_changepoints(str(tmp_path)).to_pandas()
    out = out.sort_values("changepoint_index").reset_index(drop=True)
    assert out["event_type"].eq("click").all()
    np.testing.assert_array_equal(
        out["changepoint_index"].to_numpy(np.int64), [40, 80]
    )
