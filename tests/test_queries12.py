"""Known-answer tests for the batch-14 inequality kernels (pure numpy —
the Gini/HHI integer formulations)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries12 import (
    q_hourly_gini,
    q_load_concentration_hhi,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000


@pytest.fixture(scope="module")
def sf_dir(tmp_path_factory):
    # click hourly counts: [4, 1, 1] (hours 0, 1, 2)
    counts = [4, 1, 1]
    ts = []
    for h, n in enumerate(counts):
        ts += [T0 + h * HOUR_US + k * 60_000_000 for k in range(n)]
    n = len(ts)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(["click"] * n),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    d = tmp_path_factory.mktemp("q12")
    pq.write_table(tbl, d / "events.parquet")
    return str(d)


@pytest.mark.usefixtures("ray_session")
def test_hhi_known(sf_dir):
    out = q_load_concentration_hhi(sf_dir)
    # shares 4/6, 1/6, 1/6 -> HHI = (16 + 1 + 1) / 36 = 0.5
    assert out.iloc[0]["n_hours"] == 3
    assert out.iloc[0]["hhi"] == 0.5


@pytest.mark.usefixtures("ray_session")
def test_gini_known(sf_dir):
    out = q_hourly_gini(sf_dir)
    # sorted v = [1, 1, 4], i = 1..3, n = 3:
    # num = (2-4)*1 + (4-4)*1 + (6-4)*4 = -2 + 0 + 8 = 6; gini = 6/(3*6) = 1/3
    assert out.iloc[0]["gini_num"] == 6
    assert out.iloc[0]["gini"] == round(1 / 3, 6)


@pytest.mark.usefixtures("ray_session")
def test_gini_uniform_is_zero(tmp_path):
    ts = [T0 + h * HOUR_US for h in range(5)]
    tbl = pa.table(
        {
            "event_id": pa.array(range(5), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * 5, pa.int64()),
            "event_type": pa.array(["view"] * 5),
            "value": pa.array([1.0] * 5, pa.float64()),
            "props": pa.array(["{}"] * 5),
        }
    )
    pq.write_table(tbl, tmp_path / "events.parquet")
    out = q_hourly_gini(str(tmp_path))
    assert out.iloc[0]["gini"] == 0.0
