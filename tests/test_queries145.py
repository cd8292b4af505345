"""Kernel test for pipelines/queries145.py — partial correlation
vanishes when the co-movement is entirely the confounder."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_partial_correlation_removes_common_driver(tmp_path):
    from signalsharp_ray.pipelines.queries145 import q_partial_correlation

    # z is a strong common driver: x = z + small noise-ish variation,
    # y = z + a different variation. Raw r_xy high; partial near 0.
    rng = np.random.RandomState(9)
    n_hours = 200
    z = 5 + rng.randint(0, 6, n_hours)
    x = z + rng.randint(0, 2, n_hours)
    y = z + rng.randint(0, 2, n_hours)
    rows = []
    base = pd.Timestamp("2024-01-01")
    for h in range(n_hours):
        # totals rank: a (x, biggest) > b (y) > c (z): pad a and b
        rows += [("a", base + pd.Timedelta(hours=h))] * (int(x[h]) + 4)
        rows += [("b", base + pd.Timedelta(hours=h))] * (int(y[h]) + 2)
        rows += [("c", base + pd.Timedelta(hours=h))] * int(z[h])
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.ones(len(rows), dtype=np.int64),
            "event_type": [r[0] for r in rows],
            "value": np.ones(len(rows)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_partial_correlation(str(tmp_path))
    r = out.iloc[0]
    assert (r["type_x"], r["type_y"], r["type_z"]) == ("a", "b", "c")
    assert r["r_xy"] > 0.7  # strong raw co-movement
    assert abs(r["partial_r_xy_z"]) < 0.25  # mostly the common driver
