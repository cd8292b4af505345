"""Kernel tests for pipelines/queries13.py — nearest-rank VaR / entropy /
Hill known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries13 import (
    q_hill_tail_index,
    q_load_entropy,
    q_tail_risk_by_type,
)

HOUR_US = 3_600_000_000
T0 = pd.Timestamp("2024-01-01").value // 1000


def _events_table(values, user_ids=None, hours=None):
    n = len(values)
    ts = [T0 + (hours[i] if hours else 0) * HOUR_US + i for i in range(n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array(user_ids or [1] * n, pa.int64()),
            "event_type": pa.array(["view"] * n),
            "value": pa.array([float(v) for v in values], pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_tail_risk_nearest_rank(tmp_path):
    # 40 values 1..40: ceil(0.05*40) = 2 -> VaR = 2nd smallest = 2.00
    pq.write_table(_events_table(list(range(1, 41))), tmp_path / "events.parquet")
    out = q_tail_risk_by_type(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["var_value"] == 2.0
    assert r["n_tail"] == 2          # values 1, 2
    assert r["es_value"] == 1.5      # (1+2)/2


@pytest.mark.usefixtures("ray_session")
def test_load_entropy_uniform(tmp_path):
    # 4 hours x 3 events -> H = ln(4)
    pq.write_table(
        _events_table([1.0] * 12, hours=[h for h in range(4) for _ in range(3)]),
        tmp_path / "events.parquet",
    )
    out = q_load_entropy(str(tmp_path))
    assert out.iloc[0]["entropy"] == round(math.log(4), 6)


@pytest.mark.usefixtures("ray_session")
def test_hill_known_pareto(tmp_path):
    # per-user totals = one event each; top-k=10 against the 11th
    totals = [1000.0 / (i + 1) for i in range(12)]  # exact power law alpha=1
    pq.write_table(
        _events_table(totals, user_ids=list(range(1, 13))),
        tmp_path / "events.parquet",
    )
    out = q_hill_tail_index(str(tmp_path))
    r = out.iloc[0]
    assert r["k"] == 10
    # threshold = 11th largest total in cents
    assert r["threshold_c"] == round(1000.0 / 11 * 100)
    # for x_i = C/i the Hill inverse is mean(ln(thr_rank/i)); sanity band
    assert 0.5 < r["alpha"] < 2.0
