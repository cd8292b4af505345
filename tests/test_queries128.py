"""Kernel tests for pipelines/queries128.py — support threshold, exact
triangle counting, and k-core peeling on a constructed basket graph."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_lineitem(tmp_path, baskets):
    # baskets: list of lists of partkeys; each repeated twice to clear
    # the support-2 threshold unless marked single
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
def test_triangle_and_support_threshold(tmp_path):
    from signalsharp_ray.pipelines.queries128 import q_copurchase_graph_stats

    # triangle {1,2,3} bought together twice (support 2 on all 3 edges);
    # pair (4,5) bought together ONCE -> below support, not an edge
    baskets = [[1, 2, 3], [1, 2, 3], [4, 5]]
    _write_lineitem(tmp_path, baskets)
    out = q_copurchase_graph_stats(str(tmp_path))
    r = out.iloc[0]
    assert r["n_nodes"] == 3
    assert r["n_edges"] == 3
    assert r["n_triangles"] == 1
    assert r["n_wedges"] == 3
    assert r["clustering_coef"] == pytest.approx(1.0)


@pytest.mark.usefixtures("ray_session")
def test_degree_distribution(tmp_path):
    from signalsharp_ray.pipelines.queries128 import (
        q_copurchase_degree_distribution,
    )

    # star: 1 connected to 2,3,4 (each pair twice)
    baskets = [[1, 2], [1, 2], [1, 3], [1, 3], [1, 4], [1, 4]]
    _write_lineitem(tmp_path, baskets)
    out = q_copurchase_degree_distribution(str(tmp_path)).set_index("degree")
    assert out.loc[3, "n_parts"] == 1  # the hub
    assert out.loc[1, "n_parts"] == 3  # the leaves


@pytest.mark.usefixtures("ray_session")
def test_kcore_peels_tail(tmp_path):
    from signalsharp_ray.pipelines.queries128 import q_kcore_sizes

    # triangle {1,2,3} + pendant 4-1: 2-core = the triangle; 3-core empty
    baskets = [[1, 2, 3], [1, 2, 3], [1, 4], [1, 4]]
    _write_lineitem(tmp_path, baskets)
    out = q_kcore_sizes(str(tmp_path)).set_index("k")
    assert out.loc[2, "n_nodes"] == 3 and out.loc[2, "n_edges"] == 3
    assert out.loc[3, "n_nodes"] == 0 and out.loc[3, "n_edges"] == 0
    assert out.loc[4, "n_nodes"] == 0
