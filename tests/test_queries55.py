"""Kernel test for pipelines/queries55.py — hour-of-day percentile
bands known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries55 import q_hod_percentile_bands

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000
DAY_US = 86_400_000_000


@pytest.mark.usefixtures("ray_session")
def test_hod_percentile_bands(tmp_path):
    # 3 days; hour 9 loads 1, 2, 3 across days; other hours only day 0
    rows = []
    eid = 0
    for d, c in [(0, 1), (1, 2), (2, 3)]:
        for _ in range(c):
            rows.append(T0 + d * DAY_US + 9 * HOUR_US + eid)
            eid += 1
    rows.append(T0 + 5 * HOUR_US + eid)  # hour 5 only on day 0
    tbl = pa.table(
        {
            "event_id": pa.array(range(len(rows)), pa.int64()),
            "ts": pa.array(np.array(rows, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * len(rows), pa.int64()),
            "event_type": pa.array(["view"] * len(rows)),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_hod_percentile_bands(str(tmp_path)).set_index("hod")
    assert len(out) == 24
    assert (out["n_days"] == 3).all()
    # hour 9: sorted loads [1,2,3] -> p10 = 1, p50 = 2, p90 = 3
    assert out.loc[9, "p10"] == 1
    assert out.loc[9, "p50"] == 2
    assert out.loc[9, "p90"] == 3
    # hour 5: loads [0, 0, 1] -> p50 = 0, p90 = 1
    assert out.loc[5, "p50"] == 0
    assert out.loc[5, "p90"] == 1
