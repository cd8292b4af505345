"""Kernel tests for pipelines/queries129.py — duplicate multiplicity
accounting, precision classes, crest factor and sparsity math."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, ts, event_type, value, users=None):
    n = len(ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": pd.to_datetime(ts).astype("datetime64[us]"),
            "user_id": np.asarray(
                users if users is not None else np.ones(n), dtype=np.int64
            ),
            "event_type": event_type,
            "value": np.asarray(value, dtype=np.float64),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_duplicate_audit_multiplicities(tmp_path):
    from signalsharp_ray.pipelines.queries129 import q_event_duplicate_audit

    # one triple-ingested row, one double, two singles
    ts = ["2024-01-01 10:00:00"] * 3 + ["2024-01-01 11:00:00"] * 2 + [
        "2024-01-01 12:00:00", "2024-01-01 13:00:00",
    ]
    _write_events(tmp_path, ts, "e", [5.0] * 5 + [1.0, 2.0])
    out = q_event_duplicate_audit(str(tmp_path)).set_index("multiplicity")
    assert out.loc[3, "n_groups"] == 1 and out.loc[3, "excess_rows"] == 2
    assert out.loc[2, "n_groups"] == 1 and out.loc[2, "excess_rows"] == 1
    assert out.loc[1, "n_groups"] == 2 and out.loc[1, "excess_rows"] == 0


@pytest.mark.usefixtures("ray_session")
def test_value_precision_classes(tmp_path):
    from signalsharp_ray.pipelines.queries129 import q_value_precision_audit

    vals = [3.0, 7.5, 1.23, 4.56]  # whole, tenth, cents, cents
    _write_events(tmp_path, ["2024-01-01 10:00:00"] * 4, "t", vals)
    r = q_value_precision_audit(str(tmp_path)).iloc[0]
    assert r["n_whole"] == 1 and r["n_tenth"] == 1 and r["n_cents"] == 2
    assert r["cents_share"] == pytest.approx(0.5)


@pytest.mark.usefixtures("ray_session")
def test_crest_factor_and_sparsity(tmp_path):
    from signalsharp_ray.pipelines.queries129 import (
        q_crest_factor,
        q_grid_sparsity,
    )

    # 4-hour grid: counts [4, 0, 0, 4] -> mean 2, crest 2; sparsity 0.5
    ts = ["2024-01-01 00:00:30"] * 4 + ["2024-01-01 03:00:30"] * 4
    _write_events(tmp_path, ts, "c", np.ones(8))
    cf = q_crest_factor(str(tmp_path)).iloc[0]
    assert cf["peak_count"] == 4 and cf["total"] == 8 and cf["n_hours"] == 4
    assert cf["crest"] == pytest.approx(2.0)
    sp = q_grid_sparsity(str(tmp_path)).iloc[0]
    assert sp["n_present"] == 2 and sp["n_zero"] == 2
    assert sp["sparsity"] == pytest.approx(0.5)
