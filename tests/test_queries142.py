"""Kernel tests for pipelines/queries142.py — modularity extremes and
Good-Turing accounting."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_graph_tables(tmp_path, baskets, brands):
    rows = []
    for ok, parts in enumerate(baskets):
        for p in parts:
            rows.append((ok, p))
    li = pd.DataFrame(
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
    pq.write_table(pa.Table.from_pandas(li), tmp_path / "lineitem.parquet")
    part = pd.DataFrame(
        {
            "p_partkey": np.array(sorted(brands), dtype=np.int64),
            "p_brand": [brands[k] for k in sorted(brands)],
        }
    )
    pq.write_table(pa.Table.from_pandas(part), tmp_path / "part.parquet")


@pytest.mark.usefixtures("ray_session")
def test_modularity_high_for_brand_silos(tmp_path):
    from signalsharp_ray.pipelines.queries142 import q_brand_modularity

    # two brand-pure triangles, no cross edges -> Q = 1/2 for 2 equal
    # communities: sum(3/6 - (6/12)^2) * 2 = 2*(0.5 - 0.25) = 0.5
    baskets = [[1, 2, 3], [1, 2, 3], [4, 5, 6], [4, 5, 6]]
    brands = {1: "A", 2: "A", 3: "A", 4: "B", 5: "B", 6: "B"}
    _write_graph_tables(tmp_path, baskets, brands)
    out = q_brand_modularity(str(tmp_path))
    assert out.iloc[0]["modularity"] == pytest.approx(0.5)
    r = out.set_index("brand")
    assert r.loc["A", "intra_edges"] == 3
    assert r.loc["A", "degree_sum"] == 6


@pytest.mark.usefixtures("ray_session")
def test_good_turing_mass(tmp_path):
    from signalsharp_ray.pipelines.queries142 import q_good_turing_mass

    df = pd.DataFrame(
        {
            "doc_id": np.array([0], dtype=np.int64),
            "text": ["aa aa bb cc"],  # N=4, hapax occurrences bb+cc = 2
            "lang": ["en"],
            "source": ["s0"],
            "n_chars": np.array([11], dtype=np.int64),
        }
    )
    pq.write_table(pa.Table.from_pandas(df), tmp_path / "documents.parquet")
    out = q_good_turing_mass(str(tmp_path))
    r = out.iloc[0]
    assert r["n_tokens"] == 4 and r["n_hapax"] == 2
    assert r["unseen_mass"] == pytest.approx(0.5)
    assert r["coverage"] == pytest.approx(0.5)
