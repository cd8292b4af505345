"""Kernel tests for pipelines/queries136.py — orphan detection, null
accounting, duplicate-key accounting on constructed tables."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mini_warehouse(tmp_path):
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "r_regionkey": np.array([0], dtype=np.int64),
                    "r_name": ["R"],
                }
            )
        ),
        tmp_path / "region.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "n_nationkey": np.array([0, 1], dtype=np.int64),
                    "n_name": ["A", "B"],
                    "n_regionkey": np.array([0, 7], dtype=np.int64),  # 7 orphan
                }
            )
        ),
        tmp_path / "nation.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "c_custkey": np.array([1, 2], dtype=np.int64),
                    "c_nationkey": np.array([0, 1], dtype=np.int64),
                }
            )
        ),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "s_suppkey": np.array([1], dtype=np.int64),
                    "s_nationkey": np.array([0], dtype=np.int64),
                }
            )
        ),
        tmp_path / "supplier.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "p_partkey": np.array([1, 2], dtype=np.int64),
                    "p_name": ["x", "y"],
                }
            )
        ),
        tmp_path / "part.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "o_orderkey": np.array([10, 11, 11], dtype=np.int64),
                    "o_custkey": np.array([1, 2, 9], dtype=np.int64),
                    "o_totalprice": np.array([1.0, 2.0, None]),
                    "o_orderdate": pd.to_datetime(
                        ["2024-01-01", "2024-01-02", "2024-01-03"]
                    ).astype("datetime64[us]"),
                }
            )
        ),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "l_orderkey": np.array([10, 99, 99], dtype=np.int64),
                    "l_partkey": np.array([1, 2, 5], dtype=np.int64),
                    "l_suppkey": np.array([1, 1, 1], dtype=np.int64),
                    "l_quantity": np.array([1.0, 2.0, 3.0]),
                    "l_extendedprice": np.array([1.0, 2.0, 3.0]),
                }
            )
        ),
        tmp_path / "lineitem.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "event_id": np.array([1, 2], dtype=np.int64),
                    "ts": pd.to_datetime(
                        ["2024-01-01", "2024-01-02"]
                    ).astype("datetime64[us]"),
                    "user_id": np.array([1, 1], dtype=np.int64),
                    "event_type": ["a", "b"],
                    "value": np.array([1.0, None]),
                }
            )
        ),
        tmp_path / "events.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "doc_id": np.array([1, 1], dtype=np.int64),  # dup PK
                    "text": ["t", "u"],
                    "lang": ["en", "en"],
                    "source": ["s", "s"],
                }
            )
        ),
        tmp_path / "documents.parquet",
    )
    pq.write_table(
        pa.Table.from_pandas(
            pd.DataFrame(
                {
                    "vec_id": np.array([1], dtype=np.int64),
                    "embedding": [np.ones(4, dtype=np.float32)],
                    "label": np.array([0], dtype=np.int32),
                }
            )
        ),
        tmp_path / "embeddings.parquet",
    )


@pytest.mark.usefixtures("ray_session")
def test_referential_integrity_finds_orphans(tmp_path):
    from signalsharp_ray.pipelines.queries136 import (
        q_referential_integrity_audit,
    )

    _mini_warehouse(tmp_path)
    out = q_referential_integrity_audit(str(tmp_path)).set_index("fk_edge")
    li = out.loc["lineitem.l_orderkey->orders.o_orderkey"]
    assert li["orphan_keys"] == 1  # key 99
    assert li["orphan_rows"] == 2  # two rows carry it
    pt = out.loc["lineitem.l_partkey->part.p_partkey"]
    assert pt["orphan_keys"] == 1  # part 5
    oc = out.loc["orders.o_custkey->customer.c_custkey"]
    assert oc["orphan_keys"] == 1  # cust 9
    nr = out.loc["nation.n_regionkey->region.r_regionkey"]
    assert nr["orphan_keys"] == 1  # region 7


@pytest.mark.usefixtures("ray_session")
def test_null_profile_counts(tmp_path):
    from signalsharp_ray.pipelines.queries136 import q_null_profile

    _mini_warehouse(tmp_path)
    out = q_null_profile(str(tmp_path)).set_index(
        ["table_name", "column_name"]
    )
    assert out.loc[("events", "value"), "n_nulls"] == 1
    assert out.loc[("orders", "o_totalprice"), "n_nulls"] == 1
    assert out.loc[("events", "event_id"), "n_nulls"] == 0


@pytest.mark.usefixtures("ray_session")
def test_key_uniqueness_flags_dup_pk(tmp_path):
    from signalsharp_ray.pipelines.queries136 import q_key_uniqueness_audit

    _mini_warehouse(tmp_path)
    out = q_key_uniqueness_audit(str(tmp_path)).set_index("table_name")
    assert out.loc["documents", "n_dup_keys"] == 1
    assert out.loc["orders", "n_dup_keys"] == 1  # orderkey 11 twice
    assert out.loc["events", "n_dup_keys"] == 0
