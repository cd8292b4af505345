"""Kernel tests for pipelines/queries28.py — type-hour MI / ramp
asymmetry / hourly value variance known answers."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries28 import (
    q_ramp_asymmetry,
    q_type_hour_mi,
    q_value_variance_by_hour,
)

T0 = pd.Timestamp("2024-01-01").value // 1000
HOUR_US = 3_600_000_000


def _events(types, hours, values=None):
    n = len(types)
    ts = [T0 + hours[i] * HOUR_US + i for i in range(n)]
    return pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(np.array(ts, dtype=np.int64).astype("datetime64[us]")),
            "user_id": pa.array([1] * n, pa.int64()),
            "event_type": pa.array(types),
            "value": pa.array(values or [1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )


@pytest.mark.usefixtures("ray_session")
def test_type_hour_mi_perfect_dependence(tmp_path):
    # type 'a' only at hour 0, 'b' only at hour 1, equal counts -> MI = ln 2
    types = ["a"] * 4 + ["b"] * 4
    hours = [0] * 4 + [1] * 4
    pq.write_table(_events(types, hours), tmp_path / "events.parquet")
    out = q_type_hour_mi(str(tmp_path))
    r = out.iloc[0]
    assert r["n_events"] == 8 and r["n_cells"] == 2
    assert r["mi"] == round(math.log(2.0), 6)


@pytest.mark.usefixtures("ray_session")
def test_type_hour_mi_independence_zero(tmp_path):
    # both types uniform over both hours -> MI = 0
    types = ["a", "a", "b", "b"] * 2
    hours = [0, 1, 0, 1] * 2
    pq.write_table(_events(types, hours), tmp_path / "events.parquet")
    out = q_type_hour_mi(str(tmp_path))
    assert out.iloc[0]["mi"] == 0.0


@pytest.mark.usefixtures("ray_session")
def test_ramp_asymmetry_sawtooth(tmp_path):
    # slow climb (+1 x3) then crash (-3): rise 3, fall 3, ratio 1; then
    # steeper: counts 1,2,3,4,1 -> rises 3 (n=3), fall 3 (n=1)
    counts = [1, 2, 3, 4, 1]
    types = ["view"] * sum(counts)
    hours = [h for h, c in enumerate(counts) for _ in range(c)]
    pq.write_table(_events(types, hours), tmp_path / "events.parquet")
    out = q_ramp_asymmetry(str(tmp_path))
    df = out if isinstance(out, pd.DataFrame) else out.to_pandas()
    r = df.iloc[0]
    assert r["n_up"] == 3 and r["n_down"] == 1
    assert r["rise_total"] == 3 and r["fall_total"] == 3
    assert r["up_down_ratio"] == 1.0


@pytest.mark.usefixtures("ray_session")
def test_value_variance_by_hour(tmp_path):
    # hour 0: values 1, 3 -> mean 2, var 1; hour 1: constant -> var 0
    types = ["view"] * 4
    hours = [0, 0, 1, 1]
    values = [1.0, 3.0, 5.0, 5.0]
    pq.write_table(_events(types, hours, values), tmp_path / "events.parquet")
    out = q_value_variance_by_hour(str(tmp_path)).set_index("hod")
    assert out.loc[0, "mean_value"] == 2.0
    assert out.loc[0, "var_value"] == 1.0
    assert out.loc[1, "var_value"] == 0.0
