"""Kernel test for pipelines/queries148.py — the sawtooth AoI integral
on hand-computable gaps."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_aoi_sawtooth_integral(tmp_path):
    from signalsharp_ray.pipelines.queries148 import q_age_of_information

    # events at 0s, 10s, 40s: gaps 10s, 30s (in us)
    # avg AoI = (10^2 + 30^2)/2 / 40 seconds = 1000/80 = 12.5 s
    ts = [
        "2024-01-01 00:00:00",
        "2024-01-01 00:00:10",
        "2024-01-01 00:00:40",
    ]
    df = pd.DataFrame(
        {
            "event_id": np.arange(3, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(3, dtype=np.int64),
            "event_type": "t",
            "value": np.ones(3),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_age_of_information(str(tmp_path)).to_pandas()
    r = out.iloc[0]
    assert r["span_us"] == 40_000_000
    assert r["peak_aoi_us"] == 30_000_000
    assert r["avg_aoi_us"] == pytest.approx(12.5e6)
