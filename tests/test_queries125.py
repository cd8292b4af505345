"""Kernel tests for pipelines/queries125.py — KM risk-set math and
censoring, interpurchase gap extraction, elasticity slope on an exact
linear relationship."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, rows):
    # rows: (user, ts)
    df = pd.DataFrame(
        {
            "event_id": np.arange(len(rows), dtype=np.int64),
            "ts": pd.to_datetime([r[1] for r in rows]).astype("datetime64[us]"),
            "user_id": np.array([r[0] for r in rows], dtype=np.int64),
            "event_type": "e",
            "value": np.ones(len(rows)),
            "props": "{}",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "events.parquet")


@pytest.mark.usefixtures("ray_session")
def test_kaplan_meier_risk_sets_and_censoring(tmp_path):
    from signalsharp_ray.pipelines.queries125 import q_kaplan_meier

    # window ends 2024-01-20. users:
    #  u1: days 1..3   -> lifetime 2, dies (last day 3 < 18)
    #  u2: days 1..5   -> lifetime 4, dies
    #  u3: days 1..20  -> lifetime 19, censored (last in final 3 days)
    rows = [
        (1, "2024-01-01"), (1, "2024-01-03"),
        (2, "2024-01-01"), (2, "2024-01-05"),
        (3, "2024-01-01"), (3, "2024-01-20"),
    ]
    _write_events(tmp_path, rows)
    out = q_kaplan_meier(str(tmp_path))
    assert list(out["t_days"]) == [2, 4]
    assert list(out["n_risk"]) == [3, 2]
    assert list(out["n_deaths"]) == [1, 1]
    # S(2) = 2/3, S(4) = 2/3 * 1/2 = 1/3
    assert out["survival"].iloc[0] == pytest.approx(2 / 3, abs=1e-6)
    assert out["survival"].iloc[1] == pytest.approx(1 / 3, abs=1e-6)


def _write_orders(tmp_path, rows):
    # rows: (custkey, orderdate)
    df = pd.DataFrame(
        {
            "o_orderkey": np.arange(len(rows), dtype=np.int64),
            "o_custkey": np.array([r[0] for r in rows], dtype=np.int64),
            "o_orderstatus": "F",
            "o_totalprice": np.ones(len(rows)),
            "o_orderdate": pd.to_datetime([r[1] for r in rows]).astype(
                "datetime64[us]"
            ),
            "o_orderpriority": "1-URGENT",
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "orders.parquet")


@pytest.mark.usefixtures("ray_session")
def test_interpurchase_gap_histogram(tmp_path):
    from signalsharp_ray.pipelines.queries125 import q_interpurchase_time

    rows = [
        (1, "2024-01-01"), (1, "2024-01-08"), (1, "2024-01-15"),  # 7, 7
        (2, "2024-01-01"), (2, "2024-01-04"),  # 3
        (3, "2024-01-10"),  # single order: no gap
    ]
    _write_orders(tmp_path, rows)
    out = q_interpurchase_time(str(tmp_path)).set_index("gap_days")
    assert out.loc[7, "n_gaps"] == 2
    assert out.loc[3, "n_gaps"] == 1
    assert len(out) == 2


def _write_lineitem(tmp_path, discounts, quantities):
    n = len(discounts)
    df = pd.DataFrame(
        {
            "l_orderkey": np.arange(n, dtype=np.int64),
            "l_partkey": np.ones(n, dtype=np.int64),
            "l_suppkey": np.ones(n, dtype=np.int64),
            "l_linenumber": np.ones(n, dtype=np.int32),
            "l_quantity": np.asarray(quantities, dtype=np.float64),
            "l_extendedprice": np.ones(n),
            "l_discount": np.asarray(discounts, dtype=np.float64),
            "l_tax": np.zeros(n),
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("2024-01-01"),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "lineitem.parquet")


@pytest.mark.usefixtures("ray_session")
def test_price_elasticity_exact_linear_slope(tmp_path):
    from signalsharp_ray.pipelines.queries125 import q_price_elasticity

    # mean qty = 10 + 2 * disc_cents exactly -> slope 2
    discounts = [0.00, 0.00, 0.05, 0.05, 0.10, 0.10]
    quantities = [10.0, 10.0, 20.0, 20.0, 30.0, 30.0]
    _write_lineitem(tmp_path, discounts, quantities)
    out = q_price_elasticity(str(tmp_path))
    assert list(out["disc_cents"]) == [0, 5, 10]
    assert list(out["mean_qty"]) == [10.0, 20.0, 30.0]
    assert out["slope_qty_per_cent"].iloc[0] == pytest.approx(2.0)
