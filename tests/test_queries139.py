"""Kernel tests for pipelines/queries139.py — attribution windows and
XYZ integer predicates."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    # rows: (user, ts, type)
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": [r[2] for r in rows],
            "value": np.ones(len(rows)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_linear_attribution_splits_credit(tmp_path):
    from signalsharp_ray.pipelines.queries139 import q_linear_attribution

    rows = [
        (1, "2024-01-01 09:30", "view"),    # in window
        (1, "2024-01-01 09:45", "view"),    # in window
        (1, "2024-01-01 09:50", "click"),   # in window
        (1, "2024-01-01 08:00", "view"),    # OUTSIDE (2h before)
        (1, "2024-01-01 10:00", "purchase"),
        (2, "2024-01-01 10:00", "purchase"),  # empty window: omitted
    ]
    _write_events(tmp_path, rows)
    out = q_linear_attribution(str(tmp_path)).to_pandas()
    out = out.set_index("event_type")
    assert len(out) == 2
    assert out.loc["view", "n_of_type"] == 2
    assert out.loc["view", "credit"] == pytest.approx(2 / 3)
    assert out.loc["click", "credit"] == pytest.approx(1 / 3)
    assert (out["n_window"] == 3).all()


def _write_lineitem(tmp_path, rows):
    # rows: (part, shipdate, qty)
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(len(rows), dtype=np.int64),
            "l_partkey": np.array([r[0] for r in rows], dtype=np.int64),
            "l_suppkey": np.ones(len(rows), dtype=np.int64),
            "l_linenumber": np.ones(len(rows), dtype=np.int32),
            "l_quantity": np.array([r[2] for r in rows], dtype=np.float64),
            "l_extendedprice": np.ones(len(rows)),
            "l_discount": np.zeros(len(rows)),
            "l_tax": np.zeros(len(rows)),
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "lineitem.parquet")


@pytest.mark.usefixtures("ray_session")
def test_xyz_classes_on_constructed_demand(tmp_path):
    from signalsharp_ray.pipelines.queries139 import q_xyz_classification

    # 3 ISO-ish weeks apart; part 1 steady (10,10,10) -> CV 0 -> X
    # part 2 one week only (30,0,0): mean 10, var 200 -> CV^2=2 -> Z
    rows = [
        (1, "2024-01-01", 10.0), (1, "2024-01-08", 10.0),
        (1, "2024-01-15", 10.0),
        (2, "2024-01-01", 30.0),
    ]
    _write_lineitem(tmp_path, rows)
    out = q_xyz_classification(str(tmp_path)).set_index("part")
    assert out.loc[1, "xyz_class"] == "X"
    assert out.loc[2, "xyz_class"] == "Z"
    assert (out["n_weeks"] == 3).all()
