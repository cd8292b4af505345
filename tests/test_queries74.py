"""Kernel test for pipelines/queries74.py — NB fit known answer."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from signalsharp_ray.pipelines.queries74 import q_nb_fit_order_counts

D = lambda s: np.datetime64(s, "us")


@pytest.mark.usefixtures("ray_session")
def test_nb_fit_known(tmp_path):
    # customers with 1, 1, 4 orders: m=2, v=(1+1+16)/3-4=2 -> v<=m: empty.
    # customers with 1, 1, 7: m=3, v=(1+1+49)/3-9=8 -> r=9/5, p=3/8.
    custkeys = [1, 2, 3, 3, 3, 3, 3, 3, 3]
    n = len(custkeys)
    orders = pd.DataFrame(
        {
            "o_orderkey": np.arange(n, dtype=np.int64),
            "o_custkey": np.array(custkeys, dtype=np.int64),
            "o_orderstatus": ["O"] * n,
            "o_totalprice": np.full(n, 10.0),
            "o_orderdate": [D("1995-01-05")] * n,
            "o_orderpriority": ["1-URGENT"] * n,
        }
    )
    pq.write_table(pa.Table.from_pandas(orders), tmp_path / "orders.parquet")
    out = q_nb_fit_order_counts(str(tmp_path))
    assert len(out) == 1
    r = out.iloc[0]
    assert r["n_customers"] == 3
    assert r["mean_orders"] == 3.0
    assert r["var_orders"] == 8.0
    assert r["nb_r"] == round(9.0 / 5.0, 6)
    assert r["nb_p"] == round(3.0 / 8.0, 6)
