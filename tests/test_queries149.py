"""Kernel test for pipelines/queries149.py — Cp/Cpk hand math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_cp_cpk_hand_values(tmp_path):
    from signalsharp_ray.pipelines.queries149 import q_process_capability

    # centivalues 10000 +- 2000 (mu 10000, population sd 2000):
    # Cp = 40000/(6*2000) = 10/3; Cpk = min(30000, 10000)/(3*2000) = 5/3
    vals = [80.0, 120.0, 80.0, 120.0]
    df = pd.DataFrame(
        {
            "event_id": np.arange(4, dtype=np.int64),
            "ts": pd.to_datetime(["2024-01-01 10:00"] * 4).astype(
                "datetime64[us]"
            ),
            "user_id": np.ones(4, dtype=np.int64),
            "event_type": "t",
            "value": np.array(vals),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_process_capability(str(tmp_path))
    r = out.iloc[0]
    assert r["mu_c"] == pytest.approx(10000.0)
    assert r["sd_c"] == pytest.approx(2000.0)
    assert r["cp"] == pytest.approx(10 / 3, abs=1e-6)
    assert r["cpk"] == pytest.approx(5 / 3, abs=1e-6)
