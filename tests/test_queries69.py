"""Kernel tests for pipelines/queries69.py — mean-excess and Pearson
helper known answers."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries69 import _pearson, q_mean_excess_curve


def test_pearson_perfect():
    # y = 2x over x = 0,1,2
    x = np.array([0, 1, 2])
    y = 2 * x
    r = _pearson(3, int((x * y).sum()), int(x.sum()), int(y.sum()),
                 int((x * x).sum()), int((y * y).sum()))
    assert abs(r - 1.0) < 1e-12


def test_pearson_constant_none():
    assert _pearson(3, 6, 3, 6, 3, 12) is None  # x constant at 1


@pytest.mark.usefixtures("ray_session")
def test_mean_excess_k0(tmp_path):
    # counts 1,1,5,5 -> mean 3, sd 2; k=0 threshold 3: exceeders {5,5},
    # mean excess 2. k=1 threshold 5: none exceed (strict >).
    counts = [1, 1, 5, 5]
    ts, ids = [], 0
    base = np.datetime64("2024-01-01T00:30:00", "us")
    rows = []
    for i, c in enumerate(counts):
        for j in range(c):
            rows.append(base + np.timedelta64(i, "h") + np.timedelta64(j, "s"))
    n = len(rows)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": np.array(rows, dtype="datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": ["a"] * n,
            "value": np.ones(n, dtype=np.float64),
            "props": ["{}"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")
    out = q_mean_excess_curve(str(tmp_path)).to_pandas().set_index("k")
    assert list(out.index) == [0]
    assert out.loc[0, "threshold"] == 3.0
    assert out.loc[0, "n_exceed"] == 2
    assert out.loc[0, "mean_excess"] == 2.0
