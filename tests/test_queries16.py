"""Kernel tests for pipelines/queries16.py — Q18 / argmin / Q4 / Heaps
known answers on tiny hand-built TPC-H tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries16 import (
    q_cheapest_supplier_per_part,
    q_heaps_law_by_source,
    q_large_volume_orders,
    q_late_order_priority,
)

D = lambda s: np.datetime64(s, "us")


def _write_tpch(tmp_path, lineitem, orders=None, supplier=None, nation=None):
    pq.write_table(pa.Table.from_pandas(lineitem), tmp_path / "lineitem.parquet")
    if orders is not None:
        pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    if supplier is not None:
        pq.write_table(pa.Table.from_pandas(supplier), tmp_path / "supplier.parquet")
    if nation is not None:
        pq.write_table(pa.Table.from_pandas(nation), tmp_path / "nation.parquet")


def _li(rows):
    return pd.DataFrame(
        rows,
        columns=[
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount", "l_tax",
            "l_returnflag", "l_linestatus", "l_shipdate",
        ],
    ).astype({"l_orderkey": np.int64, "l_partkey": np.int64, "l_suppkey": np.int64,
              "l_linenumber": np.int32})


@pytest.mark.usefixtures("ray_session")
def test_large_volume_orders(tmp_path):
    li = _li([
        (1, 1, 1, 1, 200.0, 10.0, 0.0, 0.0, "N", "O", D("1995-01-10")),
        (1, 2, 1, 2, 100.0, 10.0, 0.0, 0.0, "N", "O", D("1995-01-11")),
        (2, 1, 1, 1, 50.0, 10.0, 0.0, 0.0, "N", "O", D("1995-01-12")),
    ])
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.array([7, 8], dtype=np.int64),
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [3000.0, 500.0],
            "o_orderdate": [D("1995-01-01"), D("1995-01-02")],
            "o_orderpriority": ["1-URGENT", "2-HIGH"],
        }
    )
    _write_tpch(tmp_path, li, orders=orders)
    out = q_large_volume_orders(str(tmp_path)).to_pandas()
    assert len(out) == 1  # only order 1 (300 units > 250)
    r = out.iloc[0]
    assert r["orderkey"] == 1 and r["custkey"] == 7
    assert r["total_qty_c"] == 30000
    assert r["totalprice_c"] == 300000


@pytest.mark.usefixtures("ray_session")
def test_cheapest_supplier_argmin_tiebreak(tmp_path):
    li = _li([
        (1, 10, 1, 1, 1.0, 55.0, 0.0, 0.0, "N", "O", D("1995-01-10")),
        (2, 10, 2, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", D("1995-01-11")),
        (3, 10, 3, 1, 1.0, 50.0, 0.0, 0.0, "N", "O", D("1995-01-12")),
    ])
    supplier = pd.DataFrame(
        {
            "s_suppkey": np.array([1, 2, 3], dtype=np.int64),
            "s_name": ["S1", "S2", "S3"],
            "s_nationkey": np.array([0, 1, 1], dtype=np.int32),
            "s_acctbal": [0.0, 0.0, 0.0],
        }
    )
    nation = pd.DataFrame(
        {
            "n_nationkey": np.array([0, 1], dtype=np.int32),
            "n_name": ["ALPHA", "BETA"],
            "n_regionkey": np.array([0, 0], dtype=np.int32),
        }
    )
    _write_tpch(tmp_path, li, supplier=supplier, nation=nation)
    out = q_cheapest_supplier_per_part(str(tmp_path)).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # suppliers 2 and 3 tie at 50.00 -> lowest suppkey wins
    assert r["suppkey"] == 2 and r["s_name"] == "S2" and r["n_name"] == "BETA"
    assert r["min_price_c"] == 5000


@pytest.mark.usefixtures("ray_session")
def test_late_order_priority(tmp_path):
    li = _li([
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D("1996-06-01")),  # ~517d late
        (2, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", D("1995-03-01")),  # on time
    ])
    orders = pd.DataFrame(
        {
            "o_orderkey": np.array([1, 2], dtype=np.int64),
            "o_custkey": np.array([7, 8], dtype=np.int64),
            "o_orderstatus": ["O", "O"],
            "o_totalprice": [100.0, 100.0],
            "o_orderdate": [D("1995-01-01"), D("1995-01-02")],
            "o_orderpriority": ["1-URGENT", "1-URGENT"],
        }
    )
    _write_tpch(tmp_path, li, orders=orders)
    out = q_late_order_priority(str(tmp_path))
    assert len(out) == 1
    assert out.iloc[0]["priority"] == "1-URGENT"
    assert out.iloc[0]["n_late"] == 1


@pytest.mark.usefixtures("ray_session")
def test_heaps_law_counts(tmp_path):
    docs = pd.DataFrame(
        {
            "doc_id": np.array([1, 2], dtype=np.int64),
            "text": ["the cat sat", "the dog sat down"],
            "lang": ["en", "en"],
            "source": ["web", "web"],
            "n_chars": np.array([11, 16], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(docs), tmp_path / "documents.parquet")
    out = q_heaps_law_by_source(str(tmp_path))
    r = out.iloc[0]
    assert r["n_tokens"] == 7
    assert r["vocab"] == 5  # the, cat, sat, dog, down
    import math
    assert r["heaps_beta"] == round(math.log(5.0) / math.log(7.0), 6)
