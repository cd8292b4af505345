"""Kernel test for pipelines/queries169.py — Fisher price index."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.mark.usefixtures("ray_session")
def test_price_index_doubling(tmp_path):
    """Two parts, prices exactly double between years, same baskets:
    every index = 2."""
    from signalsharp_ray.pipelines.queries169 import q_price_index_fisher

    rows = []
    # (partkey, year, unit_price, qty)
    for pk, y, up, q in [
        (1, 1995, 10.0, 5),
        (2, 1995, 20.0, 3),
        (1, 2000, 20.0, 7),
        (2, 2000, 40.0, 2),
    ]:
        rows.append(
            {
                "l_orderkey": len(rows) + 1,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": 1,
                "l_quantity": float(q),
                "l_extendedprice": up * q,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": pd.Timestamp(f"{y}-06-01"),
            }
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows)), tmp_path / "lineitem.parquet"
    )
    out = q_price_index_fisher(str(tmp_path))
    r = out.iloc[0]
    assert r["year0"] == 1995 and r["year1"] == 2000
    assert r["n_common_parts"] == 2
    assert r["laspeyres"] == pytest.approx(2.0, abs=1e-6)
    assert r["paasche"] == pytest.approx(2.0, abs=1e-6)
    assert r["fisher"] == pytest.approx(2.0, abs=1e-6)


@pytest.mark.usefixtures("ray_session")
def test_price_index_mix_shift(tmp_path):
    """Price of the heavily-bought part rises; Laspeyres (base-year
    weights) exceeds Paasche when buyers shift away from it."""
    from signalsharp_ray.pipelines.queries169 import q_price_index_fisher

    rows = []
    for pk, y, up, q in [
        (1, 1995, 10.0, 10),  # cheap, popular
        (2, 1995, 10.0, 1),
        (1, 2000, 30.0, 1),  # tripled, demand collapses
        (2, 2000, 10.0, 10),
    ]:
        rows.append(
            {
                "l_orderkey": len(rows) + 1,
                "l_partkey": pk,
                "l_suppkey": 1,
                "l_linenumber": 1,
                "l_quantity": float(q),
                "l_extendedprice": up * q,
                "l_discount": 0.0,
                "l_tax": 0.0,
                "l_returnflag": "N",
                "l_linestatus": "O",
                "l_shipdate": pd.Timestamp(f"{y}-06-01"),
            }
        )
    pq.write_table(
        pa.Table.from_pandas(pd.DataFrame(rows)), tmp_path / "lineitem.parquet"
    )
    out = q_price_index_fisher(str(tmp_path))
    r = out.iloc[0]
    # direct: L = (30*10 + 10*1)/(10*10 + 10*1) = 310/110
    assert r["laspeyres"] == pytest.approx(310 / 110, abs=1e-6)
    # P = (30*1 + 10*10)/(10*1 + 10*10) = 130/110
    assert r["paasche"] == pytest.approx(130 / 110, abs=1e-6)
    assert r["laspeyres"] > r["paasche"]
