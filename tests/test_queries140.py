"""Kernel test for pipelines/queries140.py — transfer entropy detects a
constructed one-step X-drives-Y coupling and its asymmetry."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_transfer_entropy_detects_directed_coupling(tmp_path):
    from signalsharp_ray.pipelines.queries140 import q_transfer_entropy

    # X alternates high/low blocks pseudo-randomly; Y copies X one hour
    # later (pure X->Y coupling). X independent of Y's past.
    rng = np.random.RandomState(5)
    n_hours = 240
    x_state = rng.randint(0, 2, n_hours)
    y_state = np.roll(x_state, 1)
    y_state[0] = 0
    rows = []
    base = pd.Timestamp("2024-01-01")
    for h in range(n_hours):
        # type a busier overall so it ranks first deterministically
        rows += [("a", base + pd.Timedelta(hours=h))] * (3 + 4 * int(x_state[h]))
        rows += [("b", base + pd.Timedelta(hours=h))] * (1 + 4 * int(y_state[h]))
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
    out = q_transfer_entropy(str(tmp_path))
    r = out.iloc[0]
    assert r["type_x"] == "a" and r["type_y"] == "b"
    # X drives Y: forward TE far exceeds reverse
    assert r["te_x_to_y"] > 0.3
    assert r["te_x_to_y"] > 5 * max(r["te_y_to_x"], 1e-9)
