"""Kernel test for pipelines/queries99.py — gap hazard known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries99 import q_gap_hazard_curve


@pytest.mark.usefixtures("ray_session")
def test_gap_hazard_curve(tmp_path):
    # gaps: 30s (band 0), 90s (band 1), 90s (band 1), 15min (band 10)
    offs = [0, 30, 120, 210, 1110]
    ts = [np.datetime64("2024-01-01T00:00:00", "us")
          + np.timedelta64(o, "s") for o in offs]
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
    out = q_gap_hazard_curve(str(tmp_path)).set_index("band_min")
    # band 0: 1 of 4 at risk; band 1: 2 of 3 at risk
    assert out.loc[0, "n_at_risk"] == 4
    assert out.loc[0, "hazard"] == 0.25
    assert out.loc[1, "n_at_risk"] == 3
    assert out.loc[1, "hazard"] == round(2.0 / 3.0, 6)
    # bands 2..9 have 1 at risk, hazard 0
    assert out.loc[5, "n_at_risk"] == 1
    assert out.loc[5, "hazard"] == 0.0
