"""Kernel tests for pipelines/queries144.py — second-digit extraction
and KS on constructed gap patterns."""

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, values=None, event_type="t"):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.ones(n, dtype=np.int64),
            "event_type": event_type,
            "value": np.asarray(
                values if values is not None else np.ones(n), dtype=np.float64
            ),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_benford_second_digit_extraction(tmp_path):
    from signalsharp_ray.pipelines.queries144 import q_benford_second_digit

    # centivalues: 1234 (d2=2), 56 (d2=6), 907 (d2=0), 5 (dropped: 1 digit)
    vals = [12.34, 0.56, 9.07, 0.05]
    _write_events(tmp_path, ["2024-01-01 10:00"] * 4, vals)
    out = q_benford_second_digit(str(tmp_path)).set_index("digit")
    assert out.loc[2, "n_values"] == 1
    assert out.loc[6, "n_values"] == 1
    assert out.loc[0, "n_values"] == 1
    assert out["n_values"].sum() == 3
    # expectation for d2=0: sum over d1 of log10(1 + 1/(10 d1))
    exp0 = sum(math.log10(1 + 1 / (10 * d1)) for d1 in range(1, 10))
    assert out.loc[0, "benford_expected"] == pytest.approx(exp0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_gap_ks_small_for_exponential_large_for_regular(tmp_path):
    from signalsharp_ray.pipelines.queries144 import q_gap_exponential_ks

    rng = np.random.RandomState(4)
    base = pd.Timestamp("2024-01-01")
    # exponential-ish gaps
    t = 0.0
    ts_exp = []
    for _ in range(400):
        t += rng.exponential(60.0)
        ts_exp.append(base + pd.Timedelta(seconds=t))
    _write_events(tmp_path, ts_exp)
    d_exp = q_gap_exponential_ks(str(tmp_path)).to_pandas().iloc[0]["ks_d"]

    # perfectly regular gaps: the empirical CDF jumps 0 -> 1 at the
    # mean where the exponential CDF sits at 1 - e^-1, so
    # D = max(1 - e^-1, e^-1) = 1 - e^-1
    ts_reg = [base + pd.Timedelta(seconds=60 * i) for i in range(400)]
    _write_events(tmp_path, ts_reg)
    d_reg = q_gap_exponential_ks(str(tmp_path)).to_pandas().iloc[0]["ks_d"]

    assert d_exp < 0.08
    assert d_reg > 0.3
    assert d_reg == pytest.approx(1 - math.exp(-1), abs=0.01)
