"""Kernel test for pipelines/queries147.py — L-moments against hand
math on a tiny known sample."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_l_moments_hand_values(tmp_path):
    from signalsharp_ray.pipelines.queries147 import q_l_moments

    # dense hourly counts 1,2,3,4 (4 hours, one event count each)
    ts = []
    for h, n in enumerate([1, 2, 3, 4]):
        ts += [f"2024-01-01 {h:02d}:00:30"] * n
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(ts), dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(len(ts), dtype=np.int64),
            "event_type": "t",
            "value": np.ones(len(ts)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_l_moments(str(tmp_path))
    r = out.iloc[0]
    # sorted x = [1,2,3,4]; b0 = 2.5; b1 = (0+2+6+12)/12 = 5/3;
    # b2 = (0+0+6+24)/24 = 1.25; l2 = 2*5/3 - 2.5 = 5/6;
    # l3 = 6*1.25 - 10 + 2.5 = 0 -> t3 = 0 (symmetric)
    assert r["l1"] == pytest.approx(2.5)
    assert r["l2"] == pytest.approx(5 / 6, abs=1e-6)
    assert r["t3"] == pytest.approx(0.0, abs=1e-6)
    assert -1.0 <= r["t4"] <= 1.0
