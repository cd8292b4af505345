"""Kernel test for pipelines/queries146.py — circular mean handles the
midnight wrap an arithmetic mean cannot."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_circular_mean_wraps_midnight(tmp_path):
    from signalsharp_ray.pipelines.queries146 import q_circular_hour_stats

    # activity split evenly between 23:00 and 01:00 -> circular mean 0
    # (midnight), arithmetic mean would wrongly say 12
    ts = ["2024-01-01 23:30:00"] * 10 + ["2024-01-02 01:30:00"] * 10
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(ts), dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(len(ts), dtype=np.int64),
            "event_type": "night",
            "value": np.ones(len(ts)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_circular_hour_stats(str(tmp_path))
    r = out.iloc[0]
    # mean of hours 23 and 1 on the circle = 0 (midnight)
    assert min(r["mean_hour"], 24 - r["mean_hour"]) == pytest.approx(
        0.0, abs=1e-6
    )
    # two spikes 2h apart: strong concentration
    assert r["resultant_r"] > 0.9
