"""Kernel tests for pipelines/queries132.py — 2x2 odds math,
capture-recapture estimates, lift on constructed baskets, Poisson GOF
sanity."""

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
def test_odds_ratio_hand_2x2(tmp_path):
    from signalsharp_ray.pipelines.queries132 import (
        q_odds_ratio_weekend_purchase,
    )

    # 2024-01-06 is a Saturday, 2024-01-03 a Wednesday
    rows = (
        [(1, "2024-01-06 10:00", "purchase")] * 3
        + [(1, "2024-01-06 11:00", "view")] * 1
        + [(1, "2024-01-03 10:00", "purchase")] * 2
        + [(1, "2024-01-03 11:00", "view")] * 4
    )
    _write_events(tmp_path, rows)
    out = q_odds_ratio_weekend_purchase(str(tmp_path))
    r = out.iloc[0]
    assert (r["n_weekend_purchase"], r["n_weekend_other"]) == (3, 1)
    assert (r["n_weekday_purchase"], r["n_weekday_other"]) == (2, 4)
    assert r["odds_ratio"] == pytest.approx(3 * 4 / (1 * 2))
    assert r["ci_low"] < r["odds_ratio"] < r["ci_high"]


@pytest.mark.usefixtures("ray_session")
def test_capture_recapture_lincoln_petersen(tmp_path):
    from signalsharp_ray.pipelines.queries132 import q_capture_recapture

    # span days 1..10, mid = day 5 boundary. users:
    # 1,2,3 only first half; 4,5 both; 6 only second half
    rows = []
    for u in (1, 2, 3):
        rows.append((u, "2024-01-02 10:00", "e"))
    for u in (4, 5):
        rows.append((u, "2024-01-02 10:00", "e"))
        rows.append((u, "2024-01-09 10:00", "e"))
    rows.append((6, "2024-01-09 10:00", "e"))
    rows.append((1, "2024-01-01 00:00", "e"))  # pin lo
    rows.append((6, "2024-01-10 00:00", "e"))  # pin hi
    _write_events(tmp_path, rows)
    out = q_capture_recapture(str(tmp_path))
    r = out.iloc[0]
    assert r["n_first"] == 5 and r["n_second"] == 3 and r["n_both"] == 2
    assert r["lincoln_petersen"] == pytest.approx(5 * 3 / 2)
    assert r["chapman"] == pytest.approx(6 * 4 / 3 - 1)


def _write_lineitem(tmp_path, baskets):
    rows = []
    for ok, parts in enumerate(baskets):
        for p in parts:
            rows.append((ok, p))
    df = pd.DataFrame(
        {
            "l_orderkey": np.array([r[0] for r in rows], dtype=np.int64),
            "l_partkey": np.array([r[1] for r in rows], dtype=np.int64),
            "l_suppkey": np.ones(len(rows), dtype=np.int64),
            "l_linenumber": np.ones(len(rows), dtype=np.int32),
            "l_quantity": np.ones(len(rows)),
            "l_extendedprice": np.ones(len(rows)),
            "l_discount": np.zeros(len(rows)),
            "l_tax": np.zeros(len(rows)),
            "l_returnflag": "N",
            "l_linestatus": "O",
            "l_shipdate": pd.Timestamp("2024-01-01"),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "lineitem.parquet")


@pytest.mark.usefixtures("ray_session")
def test_basket_lift_attract_and_repel(tmp_path):
    from signalsharp_ray.pipelines.queries132 import q_basket_lift

    # 4 orders; parts 1,2 always together (lift = 4*4/(4*4)=1... make
    # them attract: 1,2 together twice, each alone never; part 3 alone)
    baskets = [[1, 2], [1, 2], [3], [3]]
    _write_lineitem(tmp_path, baskets)
    out = q_basket_lift(str(tmp_path)).set_index(["pa", "pb"])
    r = out.loc[(1, 2)]
    assert r["n_both"] == 2 and r["n_a"] == 2 and r["n_b"] == 2
    # lift = 4 * 2 / (2*2) = 2 -> attraction
    assert r["lift"] == pytest.approx(2.0)


@pytest.mark.usefixtures("ray_session")
def test_poisson_gof_small_for_poisson_like(tmp_path):
    from signalsharp_ray.pipelines.queries132 import q_poisson_goodness_of_fit

    rng = np.random.RandomState(11)
    ts = []
    base = pd.Timestamp("2024-01-01")
    for h in range(200):
        n = rng.poisson(3)
        ts += [base + pd.Timedelta(hours=h, minutes=5)] * n
    _write_events(tmp_path, [(1, t, "p") for t in ts])
    out = q_poisson_goodness_of_fit(str(tmp_path))
    r = out.iloc[0]
    assert r["lam"] == pytest.approx(3.0, abs=0.5)
    # ~15 dof: a true Poisson stream should sit well under 50
    assert r["chi2_poisson"] < 50
